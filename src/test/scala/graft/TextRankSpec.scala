package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextRank

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the textbook loop in plain Scala. */
  private def ref(texts: Seq[String], cap: Int, w: Int, iter: Int,
                  k: Int): Seq[(String, Long)] = {
    val One = TextRank.One
    val toks = texts.map(t =>
      if (t == null) Array.empty[String]
      else t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    toks.foreach(_.foreach(t => cnt(t) = cnt.getOrElse(t, 0L) + 1L))
    val kept = cnt.toSeq.sortBy { case (t, n) => (-n, t) }.take(cap)
      .map(_._1).toSet
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    toks.foreach { ws =>
      for (i <- ws.indices; j <- (i + 1) to math.min(i + w, ws.length - 1)) {
        val (a, b) = (ws(i), ws(j))
        if (a != b && kept(a) && kept(b)) {
          val key = if (a < b) (a, b) else (b, a)
          edges(key) = edges.getOrElse(key, 0L) + 1L
        }
      }
    }
    val wdeg = scala.collection.mutable.Map.empty[String, Long]
    edges.foreach { case ((a, b), n) =>
      wdeg(a) = wdeg.getOrElse(a, 0L) + n
      wdeg(b) = wdeg.getOrElse(b, 0L) + n
    }
    var pr = kept.map(_ -> One).toMap
    (1 to iter).foreach { _ =>
      val c = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case ((a, b), n) =>
        c(b) = c.getOrElse(b, 0L) + pr(a) * n / wdeg(a)
        c(a) = c.getOrElse(a, 0L) + pr(b) * n / wdeg(b)
      }
      pr = kept.map(t => t -> (15L * One / 100L + 85L * c.getOrElse(t, 0L) / 100L)).toMap
    }
    pr.toSeq.sortBy { case (t, s) => (-s, t) }.take(k)
  }

  test("operator == independent reference on the fixture") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextRank.keywords(docs, "doc_id", "text", vocabCap = 32, k = 12)
      .as[(String, Long)].collect().toSeq
    val texts = docs.select($"text").as[String].collect().toSeq
    assert(got === ref(texts, cap = 32, w = 2, iter = 10, k = 12))
  }

  test("an isolated kept term settles at the damping floor") {
    // 'zq' appears alone in its doc — no co-occurrence possible; high
    // counts keep it in the vocab
    val docs = (Seq.fill(10)("zq") ++ Seq.fill(8)("alpha beta gamma"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextRank.keywords(docs, "doc_id", "text", vocabCap = 8, k = 8)
      .as[(String, Long)].collect().toMap
    assert(got("zq") === 15L * TextRank.One / 100L)
    assert(got("alpha") > got("zq"))
  }

  test("window semantics: only pairs within the window connect") {
    // w=1: 'far' never within 1 of 'hub'; with w=3 it is
    val docs = Seq((1L, "hub mid far hub mid far hub mid far"))
      .toDF("doc_id", "text")
    val w1 = TextRank.keywords(docs, "doc_id", "text", vocabCap = 3, k = 3,
      window = 1L).as[(String, Long)].collect().toMap
    val w3 = TextRank.keywords(docs, "doc_id", "text", vocabCap = 3, k = 3,
      window = 3L).as[(String, Long)].collect().toMap
    // at w=1 'far'/'hub' connect only through 'mid'-adjacent edges;
    // widening to 3 adds direct hub-far edges and lifts both off their
    // w=1 scores — and the same-term guard means no self loops either
    // way (scores stay finite and under the all-mass bound)
    assert(w1 !== w3)
    assert(w1.values.forall(v => v > 0L && v < 3L * TextRank.One))
    assert(w3.values.forall(v => v > 0L && v < 3L * TextRank.One))
  }

  test("deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, sfDir)
    val a = TextRank.keywords(docs, "doc_id", "text", vocabCap = 16, k = 8)
      .collect().toSeq
    val b = TextRank.keywords(docs.repartition(7), "doc_id", "text",
      vocabCap = 16, k = 8).collect().toSeq
    assert(a === b)
  }

  test("maxEdges bound: oversized graphs refuse loudly, results unchanged under it") {
    val docs = Tables.documents(spark, sfDir)
    // the fixture graph at cap 16 has > 4 edges — the bound must trip
    val e = intercept[IllegalArgumentException](
      TextRank.keywords(docs, "doc_id", "text", vocabCap = 16, k = 8,
        maxEdges = 4))
    assert(e.getMessage.contains("maxEdges"))
    // a bound the graph fits under changes nothing
    val tight = TextRank.keywords(docs, "doc_id", "text", vocabCap = 16,
      k = 8, maxEdges = TextRank.DefaultMaxEdges).collect().toSeq
    val loose = TextRank.keywords(docs, "doc_id", "text", vocabCap = 16,
      k = 8).collect().toSeq
    assert(tight === loose)
  }

  test("guards") {
    val docs = Tables.documents(spark, sfDir)
    intercept[IllegalArgumentException](
      TextRank.keywords(docs, "doc_id", "text", vocabCap = 0, k = 5))
    intercept[IllegalArgumentException](
      TextRank.keywords(docs, "doc_id", "text", vocabCap = 8, k = 0))
    intercept[IllegalArgumentException](
      TextRank.keywords(docs, "doc_id", "text", vocabCap = 8, k = 5, window = 0L))
    intercept[IllegalArgumentException](
      TextRank.keywords(docs, "doc_id", "text", vocabCap = 8, k = 5, iterations = 0))
    intercept[IllegalArgumentException](
      TextRank.keywords(docs, "doc_id", "text", vocabCap = 8, k = 5, maxEdges = 0))
  }
}
