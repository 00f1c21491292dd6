package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** PCA: structure recovery on anisotropic data, orthonormality,
  * eigenvalue ordering, exact projection arithmetic, determinism,
  * full-rank rotation invariance of kNN, persistence, guards. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def synth(n: Int): org.apache.spark.sql.DataFrame = {
    // variance concentrated on dim0 (~100), some on dim1 (~1), rest 0;
    // deterministic pseudo-data (no RNG)
    (0 until n).map { i =>
      val a = ((i * 37 % n).toFloat / n - 0.5f) * 20.0f
      val b = ((i * 11 % n).toFloat / n - 0.5f) * 2.0f
      (i.toLong, Seq(a, b, 0.1f, -0.2f))
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  private def floats(m: Pca.PcaModel): Seq[Array[Double]] =
    m.compFp.toSeq.map(_.map(_.toDouble / Pca.FpScale.toDouble))

  test("recovers the dominant variance direction") {
    val m = Pca.fit(synth(200), "embedding", r = 2)
    val w0 = floats(m).head
    val norm = StrictMath.sqrt(w0.map(x => x * x).sum)
    assert(StrictMath.abs(w0(0)) / norm > 0.99,
      s"top component should align with dim0: ${w0.mkString(",")}")
    // sign convention: the largest-|w| coordinate is positive
    assert(w0(0) > 0.0)
    assert(m.eigenvalues(0) > 10.0 * m.eigenvalues(1))
  }

  test("components are orthonormal and eigenvalues sorted descending") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = Pca.fit(emb, "embedding", r = 8)
    val ws = floats(m)
    for (i <- ws.indices; j <- i until ws.size) {
      val dot = ws(i).zip(ws(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(StrictMath.abs(dot - want) < 1e-3, s"W[$i]·W[$j] = $dot")
    }
    assert(m.eigenvalues.toSeq === m.eigenvalues.sorted.reverse.toSeq)
    m.eigenvalues.foreach(e => assert(e > -1e-9))
  }

  test("projectFp is the exact integer sum (BigInt cross-check)") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = Pca.fit(emb, "embedding", r = 4)
    emb.limit(20).select($"embedding").as[Seq[Float]].collect().foreach { v =>
      val xfp = v.map(x => StrictMath.floor(x.toDouble * (1L << 20).toDouble).toLong)
      val got = Pca.projectFp(xfp.toArray, m)
      m.compFp.zipWithIndex.foreach { case (w, j) =>
        val want = xfp.indices
          .map(i => BigInt(xfp(i) - m.meanFp(i)) * BigInt(w(i))).sum
        assert(BigInt(got(j)) === want, s"comp $j overflowed or forked")
      }
    }
  }

  test("fit is deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Pca.fit(emb, "embedding", r = 6)
    val b = Pca.fit(emb, "embedding", r = 6)
    assert(a.meanFp.toSeq === b.meanFp.toSeq)
    assert(a.compFp.map(_.toSeq).toSeq === b.compFp.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
  }

  test("full-rank kNN == exact L2 kNN (rotation preserves distances)") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = graft.queries.VectorQueries.qvec(spark, sfDir, 3)
    val m = Pca.fit(emb, "embedding", r = 64)
    val got = Pca.knn(emb, "vec_id", "embedding", m, q, k = 10)
      .select($"id").as[Long].collect().toSet
    val exact = emb.withColumn("d2",
        aggregate(zip_with($"embedding", typedLit(q),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => acc + x))
      .orderBy($"d2", $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSet
    assert(got === exact)
  }

  test("save/load round-trip") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = Pca.fit(emb, "embedding", r = 5)
    val dir = java.nio.file.Files.createTempDirectory("pca-model").toString
    Pca.saveModel(spark, m, dir)
    val l = Pca.loadModel(spark, dir)
    assert(l.meanFp.toSeq === m.meanFp.toSeq)
    assert(l.compFp.map(_.toSeq).toSeq === m.compFp.map(_.toSeq).toSeq)
    assert(l.eigenvalues.toSeq === m.eigenvalues.toSeq)
    assert(l.n === m.n)
  }

  test("guards: bad rank, empty corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    intercept[IllegalArgumentException](Pca.fit(emb, "embedding", 0))
    intercept[IllegalArgumentException](Pca.fit(emb, "embedding", 65))
    intercept[IllegalArgumentException](
      Pca.fit(emb.filter(lit(false)), "embedding", 2))
  }

  test("null embeddings: skipped by fit, dropped by project and knn") {
    val base = synth(120)
    val withNull = base.union(
      Seq((999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    // the null row doesn't vote: same model either way
    val m = Pca.fit(base, "embedding", r = 2)
    val mn = Pca.fit(withNull, "embedding", r = 2)
    assert(mn.n === m.n)
    assert(mn.meanFp.toSeq === m.meanFp.toSeq)
    assert(mn.compFp.map(_.toSeq).toSeq === m.compFp.map(_.toSeq).toSeq)
    // project emits zero coords for it (the DuckDB unnest-of-NULL
    // twin), knn never ranks it
    val proj = Pca.project(withNull, "vec_id", "embedding", m)
    assert(proj.filter(col("id") === 999L).count() === 0L)
    assert(proj.count() === 120L * 2)
    val top = Pca.knn(withNull, "vec_id", "embedding", m,
      Seq(0.0f, 0.0f, 0.1f, -0.2f), k = 200).collect()
    assert(top.length === 120)
    assert(!top.map(_.getLong(0)).contains(999L))
  }

  test("non-finite embeddings are refused, not silently floored to 0") {
    val bad = Seq((0L, Seq(1.0f, Float.NaN, 0.0f, 0.0f)),
        (1L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    intercept[Exception](Pca.fit(bad, "embedding", r = 2))
    val m = Pca.fit(synth(60), "embedding", r = 2)
    intercept[Exception](
      Pca.project(bad, "vec_id", "embedding", m).collect())
    intercept[Exception](
      Pca.knn(synth(60), "vec_id", "embedding", m,
        Seq(Float.NaN, 0.0f, 0.0f, 0.0f), k = 5).collect())
  }
}
