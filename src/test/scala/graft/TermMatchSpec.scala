package graft

import graft.operators.TermMatch

class TermMatchSpec extends SparkSpec {
  import spark.implicits._

  test("findTerms: the classic ushers case — suffix matches via " +
    "failure links, distinct terms ascending") {
    val a = TermMatch.buildAutomaton(Seq("he", "she", "his", "hers"))
    assert(a.findTerms("ushers").map(a.terms(_)).toSeq ===
      Seq("he", "hers", "she"))
    assert(a.findTerms("his house").map(a.terms(_)).toSeq === Seq("his"))
    assert(a.findTerms("nothing").toSeq === Seq.empty)
  }

  test("findTerms: boundaries, overlaps, unicode, duplicate/empty " +
    "dict entries, null text") {
    val a = TermMatch.buildAutomaton(
      Seq("ab", "abc", "bc", "ü", "ab", "", null))
    assert(a.terms.toSeq === Seq("ab", "abc", "bc", "ü"))
    // "abc": ab at 0, abc at 0, bc at 1 — all three, one pass
    assert(a.findTerms("abc").map(a.terms(_)).toSeq ===
      Seq("ab", "abc", "bc"))
    assert(a.findTerms("xxabyy").map(a.terms(_)).toSeq === Seq("ab"))
    assert(a.findTerms("zü").map(a.terms(_)).toSeq === Seq("ü"))
    assert(a.findTerms(null).toSeq === Seq.empty)
    assert(TermMatch.buildAutomaton(Seq.empty).findTerms("x").toSeq
      === Seq.empty)
  }

  test("findTerms == naive contains on seeded random dictionaries " +
    "and texts") {
    val rnd = new scala.util.Random(47)
    (0 until 300).foreach { _ =>
      val alphabet = "abcd"
      def rs(max: Int) = (0 until (1 + rnd.nextInt(max)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val dict = (0 until (1 + rnd.nextInt(12))).map(_ => rs(4)).distinct
      val text = rs(60)
      val a = TermMatch.buildAutomaton(dict)
      val got = a.findTerms(text).map(a.terms(_)).toSeq
      val want = dict.filter(text.contains).sorted
      assert(got === want, s"dict=$dict text=$text")
    }
  }

  test("scanTerms: per-doc report columns, empty array (not null) for" +
    " a miss, zero shuffle") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "no hits here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TermMatch.scanTerms(docs, Seq("quick", "fox", "zebra"))
    val rows = out.select($"doc_id", $"n_terms", $"terms_found")
      .as[(Long, Long, Seq[String])].collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, 2L, Seq("fox", "quick")),
      (2L, 0L, Seq.empty),
      (3L, 0L, Seq.empty)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scanTerms must not shuffle:\n$plan")
  }
}
