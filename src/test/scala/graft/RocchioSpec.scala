package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorSearch

class RocchioSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1L << 20
  private def fp(x: Float): Long =
    StrictMath.floor(x.toDouble * Scale.toDouble).toLong

  private def corpus = Tables.embeddings(spark, sfDir)
    .filter($"vec_id" =!= 0)
  private def qv = Tables.embeddings(spark, sfDir)
    .filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)

  /** Driver reference: the same two rounds in plain Scala. */
  private def ref(kFb: Int, k: Int, wq: Long, wf: Long): Seq[(Long, Long)] = {
    val rows = corpus.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val q = qv
    def cos(v: Seq[Float]): Float = {
      var dot = 0.0f; var na = 0.0f; var nb = 0.0f; var i = 0
      while (i < v.length) { dot += v(i) * q(i); na += v(i) * v(i); nb += q(i) * q(i); i += 1 }
      (dot / (math.sqrt(na.toDouble).toFloat * math.sqrt(nb.toDouble).toFloat))
    }
    val fb = rows.map { case (id, v) => (id, v, cos(v).toDouble) }
      .sortBy { case (id, _, s) => (-s, id) }.take(kFb).map(_._2)
    val d = q.length
    val qp = Array.tabulate(d) { j =>
      var s = 0L
      fb.foreach(v => s += fp(v(j)))
      wq * fp(q(j)) + wf * (s / fb.length.toLong)
    }
    rows.map { case (id, v) =>
      var acc = 0L; var j = 0
      while (j < d) { acc += fp(v(j)) * qp(j); j += 1 }
      (id, acc)
    }.sortBy { case (id, s) => (-s, id) }.take(k).toSeq
  }

  test("operator == driver reference, exactly") {
    val got = VectorSearch.rocchioTopK(corpus, qv, kFb = 8, k = 12)
      .select($"vec_id", $"dot_fp").as[(Long, Long)].collect().toSeq
    assert(got === ref(kFb = 8, k = 12, wq = 2L, wf = 1L))
  }

  test("wf=0 degenerates to the pure fixed-point query ranking") {
    val got = VectorSearch.rocchioTopK(corpus, qv, kFb = 8, k = 10,
      wq = 1L, wf = 0L).select($"vec_id").as[Long].collect().toSeq
    val rows = corpus.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val q = qv
    val want = rows.map { case (id, v) =>
      var acc = 0L; var j = 0
      while (j < q.length) { acc += fp(v(j)) * fp(q(j)); j += 1 }
      (id, acc)
    }.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq
    assert(got === want)
  }

  test("null embeddings and null ids never rank and never join the feedback set") {
    val nullId: java.lang.Long = null
    val holed = corpus.union(
      Seq((9999L, null.asInstanceOf[Seq[Float]], 0))
        .toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>")))
      .union(corpus.limit(1)
        .withColumn("vec_id", lit(nullId).cast("long")))
    val got = VectorSearch.rocchioTopK(holed, qv, kFb = 8, k = 500)
    val ids = got.select($"vec_id").collect().map(_.get(0))
    assert(!ids.contains(9999L) && !ids.contains(null))
    assert(got.collect().toSeq ===
      VectorSearch.rocchioTopK(corpus, qv, kFb = 8, k = 500).collect().toSeq)
  }

  test("guards") {
    intercept[IllegalArgumentException](
      VectorSearch.rocchioTopK(corpus, qv, kFb = 0, k = 5))
    intercept[IllegalArgumentException](
      VectorSearch.rocchioTopK(corpus, qv, kFb = 5, k = 0))
    intercept[IllegalArgumentException](
      VectorSearch.rocchioTopK(corpus.filter(lit(false)), qv, kFb = 5, k = 5))
  }
}
