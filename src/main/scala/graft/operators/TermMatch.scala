package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-term dictionary scan — the linear-time primitive behind
  * bad-word filtering, brand-term audits, and blocklist-phrase
  * curation at corpus scale. A 10k-term dictionary as one regex
  * alternation is catastrophic (alternation cost scales with the
  * dictionary), and 10k separate `contains` passes re-scan the text
  * 10k times; an Aho–Corasick automaton finds every occurrence of
  * every term in ONE pass over the text, O(|text| + matches),
  * dictionary size irrelevant at match time.
  *
  * Matching is plain SUBSTRING matching (case-sensitive, no word
  * boundaries) — well-defined in every engine, so the oracle can
  * replay `position(term IN text) > 0` per term. The reported
  * signal is the DISTINCT terms present (count + the sorted term
  * list), which is the curation decision input ("which blocklist
  * terms does this doc contain"), not the occurrence count — and is
  * oracle-exact regardless of overlap semantics.
  *
  * Scale shape: the automaton builds ONCE on the driver (goto/fail
  * links over chars; linear in total dictionary size) and rides the
  * UDF closure to every executor — a narrow per-row projection, zero
  * shuffle. The dictionary is curation-scale (thousands of terms, not
  * corpus-scale); a corpus-sized "dictionary" is a join problem, not
  * a scan problem. */
object TermMatch {

  /** Aho–Corasick automaton over exact char sequences. Built once,
    * immutable, serializable (rides the UDF closure). */
  final class Automaton private[TermMatch] (
      private val next: Array[scala.collection.immutable.Map[Char, Int]],
      private val fail: Array[Int],
      private val out: Array[List[Int]],
      val terms: Array[String]) extends Serializable {

    /** Indices (into [[terms]]) of the DISTINCT terms occurring in
      * `text` as substrings, ascending. */
    def findTerms(text: String): Array[Int] = {
      if (text == null || terms.isEmpty) return Array.empty
      val seen = new Array[Boolean](terms.length)
      var nSeen = 0
      var s = 0
      var i = 0
      val n = text.length
      while (i < n && nSeen < terms.length) {
        val c = text.charAt(i)
        while (s != 0 && !next(s).contains(c)) s = fail(s)
        s = next(s).getOrElse(c, 0)
        var o = s
        while (o != 0 && nSeen < terms.length) {
          out(o).foreach { t =>
            if (!seen(t)) { seen(t) = true; nSeen += 1 }
          }
          o = fail(o)
        }
        i += 1
      }
      val r = Array.newBuilder[Int]
      var t = 0
      while (t < terms.length) { if (seen(t)) r += t; t += 1 }
      r.result()
    }
  }

  /** Build the automaton: trie of the distinct non-empty terms, then
    * BFS failure links (the classic construction). Term order in the
    * result is sorted — deterministic whatever order the caller hands
    * the dictionary in. */
  def buildAutomaton(dictionary: Seq[String]): Automaton = {
    val terms = dictionary.filter(t => t != null && t.nonEmpty)
      .distinct.sorted.toArray
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    terms.zipWithIndex.foreach { case (term, ti) =>
      var s = 0
      term.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += scala.collection.mutable.Map.empty[Char, Int]
          outB += Nil
          next.length - 1
        })
      }
      outB(s) = ti :: outB(s)
    }
    val fail = new Array[Int](next.length)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = next(f).get(c).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    new Automaton(next.map(_.toMap).toArray, fail,
      outB.map(_.sorted).toArray, terms)
  }

  /** Per-document term report: (input columns +) `n_terms` (distinct
    * dictionary terms present) and `terms_found` (those terms,
    * ascending — deterministic). One automaton pass per document in
    * the scan task; zero shuffle. */
  def scanTerms(docs: DataFrame, dictionary: Seq[String],
                textCol: String = "text"): DataFrame = {
    val auto = buildAutomaton(dictionary)
    val u = udf { (t: String) =>
      val idx = auto.findTerms(t)
      idx.map(auto.terms(_)).toSeq
    }
    docs
      .withColumn("terms_found", u(col(textCol)))
      .withColumn("n_terms", size(col("terms_found")).cast("long"))
  }
}
