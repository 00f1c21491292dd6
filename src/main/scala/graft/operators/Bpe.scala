package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer INDUCTION over the corpus (north-star scope): training
  * pipelines don't just apply a tokenizer, they periodically re-learn
  * one from the data they curate (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016).
  *
  * Scale split, mirroring production tokenizer trainers: the part that
  * is corpus-sized — tokenize + weighted word count — is ONE
  * distributed map-side-combined aggregation; the merge recursion then
  * runs on the weighted word VOCABULARY, whose size is corpus-
  * independent (Heaps' law, plus an explicit frequency cap here): pair
  * statistics over (word, count) are exactly the corpus pair statistics
  * for words retained, and a 100 TB corpus changes the counts, not the
  * vocabulary's memory footprint. `maxVocab`/`minCount` make the cap
  * explicit and loud rather than implied.
  *
  * Word boundaries are never merged across (symbols live inside words);
  * ties in pair frequency break lexicographically so training is fully
  * deterministic. */
object Bpe {

  /** One learned merge: rank order, the two symbols joined, and the
    * weighted pair count at the time of the merge. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Distributed weighted word vocabulary: ONE shuffle on the word.
    * At 100 TB this is the only corpus-sized step of training. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(array_remove(split(col(textCol), " "), "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Learn `nMerges` BPE merges from the corpus. The capped vocab is
    * collected ordered by (count desc, word) — deterministic — and the
    * exact merge recursion runs over it. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 1L, maxVocab: Int = 200000): Seq[Merge] = {
    val vocab = wordVocab(docs, textCol)
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromVocab(vocab, nMerges)
  }

  /** Split a word into Unicode code points (NOT UTF-16 chars: a
    * char-level split would tear surrogate pairs into lone surrogates,
    * which UTF8String later mangles to '?' in the merge table). */
  private[operators] def codePointSymbols(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var j = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(j) = new String(Character.toChars(cp))
      i += Character.charCount(cp); j += 1
    }
    out
  }

  /** The merge recursion over a weighted word vocabulary (exact BPE). */
  def trainFromVocab(vocab: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    // each word as a mutable symbol sequence, weighted by its count
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, n) => (codePointSymbols(w), n) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax by count, ties to the lexicographically smallest pair
        val (best, bestN) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        merges += Merge(rank, best._1, best._2, bestN)
        words = words.map { case (syms, n) => (mergePair(syms, best), n) }
        rank += 1
      }
    }
    merges.result()
  }

  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word with learned merges: repeatedly apply the
    * lowest-rank merge present (the standard BPE inference rule — for
    * words seen in training this exactly replays the training state). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = codePointSymbols(word)
    var cont = true
    while (cont && syms.length > 1) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) cont = false
      else syms = mergePair(syms, (syms(bestIdx), syms(bestIdx + 1)))
    }
    syms.toSeq
  }

  /** Persist a learned merge table (`dir/merges`, rank-ordered) for
    * [[graft.serving.Serving.encodeBpe]] — the saveNbModel split:
    * nightly batch train, driver-latency tokenize probe. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], dir: String): Unit = {
    import spark.implicits._
    merges.sortBy(_.rank).toDF("rank", "left", "right", "count")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
  }

  /** Load a [[saveMerges]] layout back into the merge sequence. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[Merge] =
    spark.read.parquet(s"$dir/merges").orderBy(col("rank"))
      .collect().map(r => Merge(r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq

  /** Corpus tokenization with a learned merge table — the distributed
    * APPLY step: merges ride the closure (kilobytes), the scan is a
    * narrow map. */
  def encodeColumn(text: Column, merges: Seq[Merge]): Column = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val u = udf { (t: String) =>
      if (t == null) Seq.empty[String]
      else t.split(" ").filter(_.nonEmpty).toSeq.flatMap(w => encodeWord(w, ranks))
    }
    u(text)
  }
}
