package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (north-star scope): the OTHER major
  * subword family next to BPE — SentencePiece's default (Kudo,
  * "Subword Regularization", ACL 2018). Where BPE greedily merges the
  * most frequent pair, the unigram model keeps an explicit piece
  * vocabulary with probabilities, trains them by EM over the
  * segmentation lattice, and tokenizes by VITERBI — the segmentation
  * maximizing Σ log p(piece).
  *
  * Scale split, exactly the [[Bpe]] contract: the corpus-sized step is
  * the ONE distributed weighted word count ([[Bpe.wordVocab]]); EM
  * then runs over the capped word VOCABULARY (corpus-independent size —
  * Heaps' law plus the explicit `maxVocab` cap), per-word lattices
  * bounded by `maxPieceLen`. A 100 TB corpus changes the counts
  * feeding EM, not its memory footprint. The distributed APPLY step
  * ([[encodeColumn]]) maps each word through Viterbi with the bounded
  * vocab riding the closure.
  *
  * Determinism + replay contract: the trained table carries
  * fixed-point log-probabilities `logp_fp = floor(ln p · 2^20)`
  * (StrictMath, the repo's portability rule), so Viterbi scores are
  * EXACT LONG SUMS — engine-portable, no float accumulation at the
  * argmax boundary. Tie rule: maximal score, then the SMALLEST start
  * position (longest final piece) — mirrored by the oracle's
  * `(negscore, i)` struct sort. Characters unseen at training time
  * segment as single-character pieces at the fixed [[UnkFp]] penalty,
  * so every word tokenizes (SentencePiece's unk coverage). EM itself
  * (float forward-backward) is NOT SQL-replayable — the trained vocab
  * is the gate handoff, scalatest-gated like the k-means centroids,
  * and the oracle independently replays everything downstream:
  * per-word Viterbi (recursive CTE over positions), per-doc piece
  * counts/digests, corpus piece frequencies. */
object Unigram {

  /** Fixed-point scale for log-probabilities (the [[Ann.FpScale]]
    * rule). */
  val FpScale: Long = 1L << 20

  /** Log-prob assigned to an out-of-vocabulary single character —
    * an exact constant (≈ ln 9.4e-14) far below any trained piece, so
    * unknown characters never displace a real segmentation but always
    * keep the lattice connected. */
  val UnkFp: Long = -30L * FpScale

  /** One trained piece: the string and its fixed-point log-prob. */
  final case class Piece(piece: String, logpFp: Long)

  /** The gate queries' `maxPieceLen` — ONE owner, embedded verbatim in
    * the oracle's recursive-CTE window so the two engines cannot fork
    * on the DP scan width. */
  val GateMaxPieceLen: Int = 8

  /** Learn a unigram vocabulary from the corpus. The capped weighted
    * word vocab is collected ordered (count desc, word) —
    * deterministic — and EM runs over it on the driver (bounded by
    * `maxVocab`, the [[Bpe.train]] shape). */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 8, emIters: Int = 4, minCount: Long = 2L,
            maxVocab: Int = 200000): Seq[Piece] = {
    val vocab = Bpe.wordVocab(docs, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromVocab(vocab, vocabSize, maxPieceLen, emIters, minCount)
  }

  /** Code-point substring table of a word: every (start, len≤L) piece.
    * Code points, not UTF-16 chars — the [[Bpe.codePointSymbols]]
    * rule (and DuckDB `substr` semantics). */
  private def cps(word: String): Array[String] =
    Bpe.codePointSymbols(word)

  /** EM over the weighted word vocabulary (exact SentencePiece-lite):
    * seed = every substring up to `maxPieceLen` weighted by word
    * counts (singles always kept for coverage, multi-cp pieces need
    * `minCount`); `emIters` rounds of log-domain forward-backward
    * expected counts; prune to `vocabSize` keeping ALL single
    * characters plus the top multi-cp pieces by final expected count
    * (count desc, piece asc); final probabilities renormalized over
    * the kept set. Fully deterministic: words iterate in the collected
    * order, normalization sums in sorted piece order, logs are
    * StrictMath. */
  def trainFromVocab(vocab: Seq[(String, Long)], vocabSize: Int,
                     maxPieceLen: Int = 8, emIters: Int = 4,
                     minCount: Long = 2L): Seq[Piece] = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val words = vocab.map { case (w, n) => (cps(w), n) }
      .filter(_._1.nonEmpty)
    // --- seed: weighted substring counts
    val seed = scala.collection.mutable.HashMap.empty[String, Double]
    words.foreach { case (syms, n) =>
      var i = 0
      while (i < syms.length) {
        val sb = new StringBuilder
        var l = 0
        while (l < maxPieceLen && i + l < syms.length) {
          sb.append(syms(i + l))
          val p = sb.toString
          seed(p) = seed.getOrElse(p, 0.0) + n.toDouble
          l += 1
        }
        i += 1
      }
    }
    val singles: Set[String] = words.flatMap(_._1).toSet
    val candidates: Set[String] = seed.keysIterator
      .filter(p => singles.contains(p) || seed(p) >= minCount.toDouble)
      .toSet
    def normalize(counts: collection.Map[String, Double]): Map[String, Double] = {
      val keys = counts.keysIterator.toArray.sorted
      var tot = 0.0
      keys.foreach(k => tot += counts(k))
      keys.iterator.map(k => k -> counts(k) / tot).toMap
    }
    var probs = normalize(seed.filter { case (k, _) => candidates.contains(k) })
    // --- EM: expected piece counts by forward-backward per word
    var expCounts: Map[String, Double] = probs
    var iter = 0
    while (iter < emIters) {
      val exp = scala.collection.mutable.HashMap.empty[String, Double]
      val logp = probs.map { case (k, v) => k -> StrictMath.log(v) }
      words.foreach { case (syms, n) =>
        val len = syms.length
        val L = maxPieceLen
        // piece(i)(l) = syms[i, i+l+1) — built once per word
        val pieceAt = Array.tabulate(len) { i =>
          val sb = new StringBuilder
          val out = new Array[String](math.min(L, len - i))
          var l = 0
          while (l < out.length) { sb.append(syms(i + l)); out(l) = sb.toString; l += 1 }
          out
        }
        def lse(a: Double, b: Double): Double =
          if (a == Double.NegativeInfinity) b
          else if (b == Double.NegativeInfinity) a
          else { val m = math.max(a, b); m + StrictMath.log(StrictMath.exp(a - m) + StrictMath.exp(b - m)) }
        val la = Array.fill(len + 1)(Double.NegativeInfinity)
        la(0) = 0.0
        var j = 1
        while (j <= len) {
          var i = math.max(0, j - L)
          while (i < j) {
            logp.get(pieceAt(i)(j - i - 1)).foreach { lp =>
              la(j) = lse(la(j), la(i) + lp)
            }
            i += 1
          }
          j += 1
        }
        val lb = Array.fill(len + 1)(Double.NegativeInfinity)
        lb(len) = 0.0
        var i = len - 1
        while (i >= 0) {
          var jj = i + 1
          while (jj <= math.min(len, i + L)) {
            logp.get(pieceAt(i)(jj - i - 1)).foreach { lp =>
              lb(i) = lse(lb(i), lp + lb(jj))
            }
            jj += 1
          }
          i -= 1
        }
        val total = la(len)
        if (total != Double.NegativeInfinity) {
          i = 0
          while (i < len) {
            var jj = i + 1
            while (jj <= math.min(len, i + L)) {
              val p = pieceAt(i)(jj - i - 1)
              logp.get(p).foreach { lp =>
                val post = StrictMath.exp(la(i) + lp + lb(jj) - total)
                if (post > 0.0) exp(p) = exp.getOrElse(p, 0.0) + post * n.toDouble
              }
              jj += 1
            }
            i += 1
          }
        }
      }
      // singles survive even a zero expected count (coverage floor)
      singles.foreach(s => if (!exp.contains(s)) exp(s) = java.lang.Double.MIN_NORMAL)
      expCounts = exp.toMap
      probs = normalize(exp)
      iter += 1
    }
    // --- prune: all singles + top multi-cp pieces by expected count
    val multis = expCounts.keysIterator.filterNot(singles.contains).toArray
      .sortBy(p => (-expCounts(p), p))
      .take(math.max(0, vocabSize - singles.size))
    val kept = (singles ++ multis).toArray.sorted
    var tot = 0.0
    kept.foreach(p => tot += expCounts.getOrElse(p, java.lang.Double.MIN_NORMAL))
    kept.iterator.map { p =>
      val pr = expCounts.getOrElse(p, java.lang.Double.MIN_NORMAL) / tot
      Piece(p, math.floor(StrictMath.log(pr) * FpScale.toDouble).toLong)
    }.toSeq
  }

  /** Viterbi-tokenize one word: the segmentation maximizing the exact
    * long sum of `logp_fp`, ties to the smallest start position
    * (longest final piece) — the oracle's `(negscore, i)` sort order.
    * Unknown single characters take [[UnkFp]]. */
  def encodeWord(word: String, pieces: Map[String, Long],
                 maxPieceLen: Int = 8): Seq[String] = {
    val syms = cps(word)
    val n = syms.length
    if (n == 0) return Seq.empty
    val best = new Array[Long](n + 1)
    val par = new Array[Int](n + 1)
    val pieceAt = new Array[String](n + 1)
    var j = 1
    while (j <= n) {
      var bestScore = Long.MinValue
      var bestI = -1
      var bestP: String = null
      var i = math.max(0, j - maxPieceLen)
      val sb = new StringBuilder
      var k = i
      while (k < j) { sb.append(syms(k)); k += 1 }
      // sb holds syms[i, j); shrink from the left as i advances
      while (i < j) {
        val p = sb.toString
        val lp = pieces.get(p) match {
          case Some(v) => v
          case None => if (j - i == 1) UnkFp else Long.MinValue
        }
        if (lp != Long.MinValue) {
          val s = best(i) + lp
          if (s > bestScore) { bestScore = s; bestI = i; bestP = p }
        }
        sb.delete(0, syms(i).length)
        i += 1
      }
      best(j) = bestScore; par(j) = bestI; pieceAt(j) = bestP
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += pieceAt(pos); pos = par(pos) }
    out.reverseIterator.toSeq
  }

  /** Exact Viterbi score of [[encodeWord]]'s segmentation (long sum —
    * what the oracle's DP carries). */
  def scoreWord(word: String, pieces: Map[String, Long],
                maxPieceLen: Int = 8): Long =
    encodeWord(word, pieces, maxPieceLen)
      .map(p => pieces.getOrElse(p, UnkFp)).sum

  /** Distributed APPLY: tokenize a text column word-by-word with the
    * trained vocab riding the closure (bounded by vocabSize — the
    * [[Bpe.encodeColumn]] shape). */
  def encodeColumn(text: Column, pieces: Seq[Piece],
                   maxPieceLen: Int = 8): Column = {
    val m: Map[String, Long] = pieces.map(p => p.piece -> p.logpFp).toMap
    val u = udf { (t: String) =>
      if (t == null) Seq.empty[String]
      else t.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(w => encodeWord(w, m, maxPieceLen))
    }
    u(text)
  }

  /** Persist a trained vocab (`dir/unigram_vocab`, piece-ordered) for
    * [[graft.serving.Serving.encodeUnigram]] — the saveMerges split:
    * nightly batch train, driver-latency tokenize probe. */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
                pieces: Seq[Piece], dir: String): Unit = {
    import spark.implicits._
    pieces.sortBy(_.piece).toDF("piece", "logp_fp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/unigram_vocab")
  }

  /** Load a [[saveVocab]] layout. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
                dir: String): Seq[Piece] =
    spark.read.parquet(s"$dir/unigram_vocab").orderBy(col("piece"))
      .collect().map(r => Piece(r.getString(0), r.getLong(1))).toSeq
}
