package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, Fuzzy}

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("fuzzy termSearch == driver reference; typo matches only via expansion") {
    val docs = Tables.documents(spark, sfDir)
    val got = Fuzzy.termSearch(docs, "doc_id", "text",
      Seq("vecto", "hash"), k = 20).as[(Long, Long, Long)].collect().toSeq

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val q = Seq("vecto", "hash")
    val want = texts.flatMap { case (id, t) =>
      val ws = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val hits = q.map(qt => qt -> ws.count(w => lev(w, qt) <= 1))
      val score = hits.map(_._2.toLong).sum
      if (score > 0) Some((id, score, hits.count(_._2 > 0).toLong)) else None
    }.sortBy { case (id, s, _) => (-s, id) }.take(20).toSeq
    assert(got === want)
    // 'vecto' itself never appears verbatim: every match is fuzzy
    assert(!texts.exists(_._2.toLowerCase.split("[^a-z0-9]+").contains("vecto")))
  }

  test("maxDist=0 degenerates to exact term counting") {
    val docs = Seq((1L, "hash table hash"), (2L, "hashx")).toDF("doc_id", "text")
    val got = Fuzzy.termSearch(docs, "doc_id", "text", Seq("hash"), k = 5,
      maxDist = 0).as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L)))
  }

  test("fuzzy guards") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Fuzzy.termSearch(docs, "doc_id", "text", Seq.empty, k = 5))
    intercept[IllegalArgumentException](
      Fuzzy.termSearch(docs, "doc_id", "text", Seq("a"), k = 0))
    intercept[IllegalArgumentException](
      Fuzzy.termSearch(docs, "doc_id", "text", Seq("a"), k = 5, maxDist = -1))
    // cased/punctuated query terms are refused, not silently matched
    // with the edit budget spent on normalization
    intercept[IllegalArgumentException](
      Fuzzy.termSearch(docs, "doc_id", "text", Seq("Hash"), k = 5))
    intercept[IllegalArgumentException](
      Fuzzy.termSearch(docs, "doc_id", "text", Seq("ha-sh"), k = 5))
  }

  test("knnGraph: exact within-cell ranks, no self edges, singleton cells silent") {
    val emb = Tables.embeddings(spark, sfDir)
    val index = Ann.buildIvf(emb, numClusters = 4)
    val got = Ann.knnGraph(index, k = 3).collect()

    val rows = index.assigned
      .select(col("vec_id"), col("embedding"), col("ivf_cluster"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val byCell = rows.groupBy(_._3)
    def dist(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0f; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      math.sqrt(acc.toDouble).toFloat.toDouble
    }
    val want = rows.flatMap { case (id, v, c) =>
      byCell(c).filter(_._1 != id)
        .map { case (nid, nv, _) => (id, nid, dist(v, nv)) }
        .sortBy { case (_, nid, d) => (d, nid) }
        .take(3).zipWithIndex
        .map { case ((sid, nid, d), i) => (sid, nid, d, (i + 1).toLong) }
    }.sortBy { case (sid, _, _, rn) => (sid, rn) }.toSeq
    val gotSeq = got.map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(gotSeq === want)
    gotSeq.foreach { case (s, n, _, _) => assert(s !== n) }
    // every source with a non-singleton cell appears; singletons don't
    val multi = byCell.filter(_._2.length > 1).values.flatten.map(_._1).toSet
    assert(gotSeq.map(_._1).toSet === multi)
  }

  test("knnGraph guards") {
    val emb = Tables.embeddings(spark, sfDir)
    val index = Ann.buildIvf(emb, numClusters = 2)
    intercept[IllegalArgumentException](Ann.knnGraph(index, k = 0))
  }
}
