package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer induction + apply (north-star scope): the THIRD
  * major subword family next to [[Bpe]] and [[Unigram]] — BERT's
  * tokenizer (Schuster & Nakajima, "Japanese and Korean Voice Search",
  * ICASSP 2012; Devlin et al., NAACL 2019). Where BPE merges the most
  * FREQUENT pair and unigram keeps an explicit probability model,
  * WordPiece merges the pair that most increases corpus LIKELIHOOD
  * under a unigram model — score = count(ab) / (count(a)·count(b)) —
  * and tokenizes by greedy LONGEST-MATCH-FIRST with `##` continuation
  * prefixes and a whole-word `[UNK]` fallback.
  *
  * Scale split, exactly the [[Bpe]] contract: the corpus-sized step is
  * the ONE distributed weighted word count ([[Bpe.wordVocab]]); the
  * merge recursion runs on the capped word VOCABULARY
  * (corpus-independent size — Heaps' law plus the explicit `maxVocab`
  * cap). A 100 TB corpus changes the counts, not the training
  * footprint. The distributed APPLY ([[encodeColumn]]) is a narrow map
  * with the vocab riding the closure.
  *
  * Determinism + replay contract: the merge score is ONE IEEE-double
  * expression — `c_ab.toDouble / (c_a.toDouble * c_b.toDouble)` — with
  * every count exactly representable (< 2^53), so the division and
  * multiplication round identically in any IEEE engine and the oracle
  * can rank by the same double (ties break on the lexicographically
  * smallest (left, right), the [[Bpe.trainFromVocab]] rule). Encoding
  * is greedy longest-match over CODE POINTS (the
  * [[Bpe.codePointSymbols]] rule, = DuckDB `substr` semantics); the
  * scan bound is derived FROM the vocab ([[maxMatchLen]]) so both
  * engines compute it from the same handoff rather than sharing a
  * constant. Words longer than `maxWordLen` code points emit `[UNK]`
  * whole (BERT's `max_input_chars_per_word` rule), as does any word
  * with an unmatchable position. */
object WordPiece {

  /** The whole-word fallback piece (BERT's literal). */
  val Unk: String = "[UNK]"

  /** The encode gates' `maxWordLen` — ONE owner, embedded verbatim in
    * the oracle so the two engines cannot fork on the long-word cutoff
    * (the [[Unigram.GateMaxPieceLen]] rule). Deliberately below the
    * fixture's longest word so the `[UNK]` path is exercised on real
    * gate data, not only in specs. */
  val GateMaxWordLen: Int = 7

  /** One learned merge: rank order, the two symbols joined, and the
    * weighted pair/symbol counts at the time of the merge (the counts
    * are the gate's hash material — score is derived). */
  final case class Merge(rank: Int, left: String, right: String,
                         pairCount: Long, leftCount: Long, rightCount: Long)

  /** Join a merge's symbols: the right side drops its `##` marker
    * (`h + ##e = he`, `##l + ##o = ##lo`). */
  def mergedSymbol(left: String, right: String): String =
    left + (if (right.startsWith("##")) right.substring(2) else right)

  /** The representation invariant the single-string vocab encoding
    * needs: a piece STRING starts with `##` iff it IS a continuation
    * piece. Words may legally contain `#` (the corpus splits on spaces
    * only), so an unguarded merge of bare `#` with a continuation whose
    * body starts with `#` would mint a BARE symbol reading `##…` —
    * thereafter conflated with a continuation everywhere (scan bound,
    * membership, reconstruction). Training refuses exactly those
    * candidates; since initial bare symbols are single code points and
    * every other bare merge keeps its first code point ≠ prefix-`##`,
    * the invariant holds inductively. Mirrored verbatim in the oracle's
    * argmax filter. */
  private[operators] def keepsMarkerInvariant(left: String, right: String): Boolean =
    left.startsWith("##") || !mergedSymbol(left, right).startsWith("##")

  /** A word as WordPiece symbols: first code point bare, continuations
    * `##`-prefixed. */
  private[operators] def wpSymbols(word: String): Array[String] = {
    val cps = Bpe.codePointSymbols(word)
    var i = 1
    while (i < cps.length) { cps(i) = "##" + cps(i); i += 1 }
    cps
  }

  /** The ONE capped-vocab collection rule (count desc, word asc,
    * limit) — the cap/ordering the oracle's `ORDER BY n DESC, w LIMIT`
    * must mirror; shared by [[train]] and [[trainVocabulary]] so the
    * two gates cannot fork on it. */
  private def collectVocab(docs: DataFrame, textCol: String,
                           minCount: Long, maxVocab: Int): Seq[(String, Long)] =
    Bpe.wordVocab(docs, textCol)
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Learn `nMerges` WordPiece merges from the corpus. The capped
    * vocab is collected ordered (count desc, word) — deterministic —
    * and the exact merge recursion runs over it (the [[Bpe.train]]
    * shape). */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 1L, maxVocab: Int = 200000): Seq[Merge] =
    trainFromVocab(collectVocab(docs, textCol, minCount, maxVocab), nMerges)

  /** The likelihood-merge recursion over a weighted word vocabulary.
    * Per round: weighted symbol and adjacent-pair counts, argmax of
    * the IEEE-double score with the lexicographic tie-break, merge
    * all occurrences. */
  def trainFromVocab(vocab: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      vocab.filter(_._1.nonEmpty).map { case (w, n) => (wpSymbols(w), n) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val symC = scala.collection.mutable.HashMap.empty[String, Long]
      val pairC = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          symC(syms(i)) = symC.getOrElse(syms(i), 0L) + n
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairC(k) = pairC.getOrElse(k, 0L) + n
          }
          i += 1
        }
      }
      val legal = pairC.toSeq.filter { case ((l, r), _) =>
        keepsMarkerInvariant(l, r)
      }
      if (legal.isEmpty) done = true
      else {
        val (best, bestN) = legal.minBy { case ((l, r), n) =>
          (-(n.toDouble / (symC(l).toDouble * symC(r).toDouble)), l, r)
        }
        merges += Merge(rank, best._1, best._2, bestN, symC(best._1), symC(best._2))
        val m = mergedSymbol(best._1, best._2)
        words = words.map { case (syms, n) => (mergeAll(syms, best, m), n) }
        rank += 1
      }
    }
    merges.result()
  }

  private def mergeAll(syms: Array[String], pair: (String, String),
                       merged: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += merged; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The final piece vocabulary: the initial alphabet (every bare and
    * `##`-prefixed code point of the training words, sorted) plus the
    * merged pieces in rank order, first occurrence kept. */
  def vocabulary(vocab: Seq[(String, Long)], merges: Seq[Merge]): Seq[String] = {
    val alpha = vocab.filter(_._1.nonEmpty)
      .flatMap(w => wpSymbols(w._1)).distinct.sorted
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    alpha.foreach(out += _)
    merges.sortBy(_.rank).foreach(m => out += mergedSymbol(m.left, m.right))
    out.toSeq
  }

  /** Train end-to-end to the piece vocabulary (the encode gates'
    * input). */
  def trainVocabulary(docs: DataFrame, textCol: String, nMerges: Int,
                      minCount: Long = 1L, maxVocab: Int = 200000): Seq[String] = {
    val vocab = collectVocab(docs, textCol, minCount, maxVocab)
    vocabulary(vocab, trainFromVocab(vocab, nMerges))
  }

  /** Greedy scan bound in code points, derived from the vocab: the
    * longest span any piece can match (`##` marker excluded — a `##`
    * prefix always IS the marker by [[keepsMarkerInvariant]]). The
    * oracle computes the same bound from the handoff
    * (`max(length(piece) - CASE ## THEN 2 ELSE 0)`). */
  def maxMatchLen(vocab: Seq[String]): Int =
    if (vocab.isEmpty) 0
    else vocab.iterator.map { p =>
      val body = if (p.startsWith("##")) p.substring(2) else p
      body.codePointCount(0, body.length)
    }.max

  /** Greedy longest-match-first encode of one word (BERT's
    * WordpieceTokenizer): at each position take the LONGEST vocab
    * piece matching (`##`-prefixed beyond position 0); any unmatchable
    * position — or a word longer than `maxWordLen` code points — makes
    * the whole word `[UNK]`. */
  def encodeWord(word: String, vocab: Set[String], maxLen: Int,
                 maxWordLen: Int): Seq[String] = {
    val cps = Bpe.codePointSymbols(word)
    val n = cps.length
    if (n == 0) return Seq.empty
    if (n > maxWordLen) return Seq(Unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val sb = new StringBuilder
        if (pos > 0) sb.append("##")
        var k = pos
        while (k < pos + l) { sb.append(cps(k)); k += 1 }
        val cand = sb.toString
        // at position 0 a span of word text that itself reads `##…`
        // must not match: every vocab string starting with `##` IS a
        // continuation piece ([[keepsMarkerInvariant]]) and cannot seat
        // bare — greedy falls through to shorter spans
        if (vocab.contains(cand) && !(pos == 0 && cand.startsWith("##")))
          hit = cand
        else l -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit; pos += l
    }
    out.toSeq
  }

  /** Distributed APPLY: tokenize a text column with the trained vocab
    * riding the closure (the [[Bpe.encodeColumn]] shape — a narrow
    * map, no shuffle). */
  def encodeColumn(text: Column, vocab: Seq[String], maxWordLen: Int): Column = {
    val vset: Set[String] = vocab.toSet
    val maxLen = maxMatchLen(vocab)
    val u = udf { (t: String) =>
      if (t == null) Seq.empty[String]
      else t.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(w => encodeWord(w, vset, maxLen, maxWordLen))
    }
    u(text)
  }

  /** Persist a trained vocabulary (`dir/wordpiece_vocab`,
    * piece-ordered) for
    * [[graft.serving.Serving.encodeWordPiece]] — the
    * [[Bpe.saveMerges]] split: nightly batch train, driver-latency
    * tokenize probe. */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
                vocab: Seq[String], dir: String): Unit = {
    import spark.implicits._
    vocab.sorted.toDF("piece")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/wordpiece_vocab")
  }

  /** Load a [[saveVocab]] layout. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
                dir: String): Seq[String] =
    spark.read.parquet(s"$dir/wordpiece_vocab").orderBy(col("piece"))
      .collect().map(_.getString(0)).toSeq
}
