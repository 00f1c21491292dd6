package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Qld

class QldSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)
  private val Terms = Seq("vector", "hash", "join")
  private val Mu = 2000L

  /** Driver-side DENSE reference — the textbook per-doc × per-term
    * double loop the operator's sparse rewrite must equal exactly. */
  private def dense(texts: Seq[(Long, String)], terms: Seq[String],
                    mu: Long): Map[Long, (Long, Long)] = {
    def tok(t: String): Seq[String] =
      if (t == null) Seq.empty
      else t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val toks = texts.map { case (id, t) => id -> tok(t) }
    val n = toks.map(_._2.length.toLong).sum
    val cf = terms.map(t => t -> toks.map(_._2.count(_ == t).toLong).sum)
      .filter(_._2 > 0L)
    def lnFp(v: Long): Long =
      StrictMath.floor(StrictMath.log(v.toDouble) * Qld.LnScale).toLong
    toks.map { case (id, ws) =>
      val dl = ws.length.toLong
      var s = 0L
      var m = 0L
      cf.foreach { case (t, c) =>
        val tf = ws.count(_ == t).toLong
        if (tf > 0L) m += 1L
        s += lnFp(tf * n + mu * c) - lnFp(n * (dl + mu))
      }
      id -> (s, m)
    }.toMap
  }

  test("sparse operator == dense reference, exactly, over the fixture") {
    val (res, _) = Qld.topK(docs, "doc_id", "text", Terms, k = 50, mu = Mu)
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val want = dense(texts, Terms, Mu)
    val got = res.collect()
    assert(got.length === math.min(50, texts.length))
    got.foreach { r =>
      val (s, m) = want(r.getLong(0))
      assert(r.getLong(1) === s, s"score fork for doc ${r.getLong(0)}")
      assert(r.getLong(2) === m)
    }
    // and the ranking is the want-order: score desc, id asc
    val expectedOrder = want.toSeq.sortBy { case (id, (s, _)) => (-s, id) }
      .take(got.length).map(_._1)
    assert(got.map(_.getLong(0)).toSeq === expectedOrder)
  }

  test("a query with NO corpus-present term ranks nothing") {
    val (res, _) = Qld.topK(docs, "doc_id", "text",
      Seq("zzzzqqqqxxxx", "qqqqzzzzyyyy"), k = 10, mu = Mu)
    assert(res.count() === 0L)
  }

  test("a query term absent from the corpus is dropped, not -inf") {
    val (base, _) = Qld.topK(docs, "doc_id", "text", Terms, k = 10, mu = Mu)
    val (plus, _) = Qld.topK(docs, "doc_id", "text",
      Terms :+ "zzzzqqqqxxxx", k = 10, mu = Mu)
    assert(base.collect().toSeq === plus.collect().toSeq)
  }

  test("lnTable covers every ln argument and carries the operator's own values") {
    val (_, lnT) = Qld.topK(docs, "doc_id", "text", Terms, k = 10, mu = Mu)
    val rows = lnT.as[(Long, Long)].collect()
    rows.foreach { case (v, fp) =>
      assert(v > 0L)
      assert(fp === StrictMath.floor(StrictMath.log(v.toDouble) * Qld.LnScale).toLong)
    }
    // the C-values (one per distinct dl) and B-values (one per kept
    // term) must all be present
    val vs = rows.map(_._1).toSet
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val toks = texts.map(_._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val n = toks.map(_.length.toLong).sum
    toks.foreach(ws => assert(vs.contains(n * (ws.length + Mu))))
    Terms.foreach { t =>
      val c = toks.map(_.count(_ == t).toLong).sum
      if (c > 0) assert(vs.contains(Mu * c))
    }
  }

  test("more matched mass ranks higher on a controlled corpus") {
    val tiny = Seq(
      (1L, "vector vector vector hash join filler filler"),
      (2L, "filler filler filler filler filler filler filler"),
      (3L, "vector hash filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val (res, _) = Qld.topK(tiny, "doc_id", "text", Terms, k = 3, mu = 10L)
    assert(res.select($"id").as[Long].collect().toSeq === Seq(1L, 3L, 2L))
    // the no-match doc still gets a (smoothed) score and n_terms 0
    val r2 = res.filter($"id" === 2L).head()
    assert(r2.getLong(2) === 0L)
  }

  test("the final cut is a TakeOrdered, not a global sort") {
    val (res, _) = Qld.topK(docs, "doc_id", "text", Terms, k = 10, mu = Mu)
    assert(res.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("guards: bad k, mu, empty terms") {
    intercept[IllegalArgumentException](Qld.topK(docs, "doc_id", "text", Terms, k = 0))
    intercept[IllegalArgumentException](Qld.topK(docs, "doc_id", "text", Terms, k = 5, mu = 0L))
    intercept[IllegalArgumentException](Qld.topK(docs, "doc_id", "text", Seq.empty, k = 5))
  }
}
