package graft

import graft.operators.{Ann, Clustering}

/** Domain-discovery spec: planted well-separated clusters must be
  * recovered exactly (purity 1.0, exact sizes), and the profile must
  * be deterministic across runs (seeded fit, stable ordering). */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def planted() = {
    // 3 clusters at distant corners of R^8, 30/20/10 points, jitter
    // small vs separation so the optimum is unambiguous
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      (0, Array.fill(8)(0f)),
      (1, Array.fill(8)(10f)),
      (2, Array.tabulate(8)(i => if (i % 2 == 0) -10f else 10f)))
    val sizes = Map(0 -> 30, 1 -> 20, 2 -> 10)
    val rows = for {
      (lbl, c) <- centers
      i <- 0 until sizes(lbl)
    } yield ((lbl * 1000 + i).toLong,
      c.map(v => v + rnd.nextFloat() * 0.1f), lbl)
    rows.toDF("vec_id", "embedding", "label")
  }

  test("k-means recovers planted domains: sizes exact, purity 1.0, cohesion tight") {
    val prof = Clustering.clusterProfile(Ann.buildIvf(planted(), 3))
      .collect()
    assert(prof.length === 3)
    // ordered by size desc → 30, 20, 10
    assert(prof.map(_.getAs[Long]("n")).toSeq === Seq(30L, 20L, 10L))
    assert(prof.forall(_.getAs[Double]("majority_frac") === 1.0))
    assert(prof.map(_.getAs[Int]("majority_label")).toSet === Set(0, 1, 2))
    // jitter is <=0.1 per dim → mean distance far below the >=20 separation
    assert(prof.forall(_.getAs[Double]("mean_dist") < 1.0))
  }

  test("profile is deterministic across independent fits") {
    val a = Clustering.clusterProfile(Ann.buildIvf(planted(), 3)).collect()
    val b = Clustering.clusterProfile(Ann.buildIvf(planted(), 3)).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }
}
