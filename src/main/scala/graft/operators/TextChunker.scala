package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-side text chunking (SURVEY §2.B4-B6), re-expressed Spark-first.
  *
  * The reference pipeline is: KSS sentence split (`text_spliter.py:54-68`,
  * newline fallback on failure) → greedy merge into ≤chunkSize-char chunks
  * joined by " " with ≤overlap-char trailing-sentence overlap
  * (`text_spliter.py:80-166`) → per-chunk metadata enrichment
  * (`document_processor.py:138-150`). Defaults 500/100 per `config.py:31-32`.
  *
  * Spark shape: the merge is inherently sequential WITHIN one document
  * (overlap is a per-doc scan) but embarrassingly parallel ACROSS
  * documents — so it is a pure Scala function applied per row via
  * `flatMap`/`explode` of a scalar UDF, no shuffle. At 100 TB the job is
  * a single narrow map stage; partition count follows the input splits.
  */
object TextChunker {

  /** B4: sentence segmentation. No KSS on the JVM (SURVEY §7.4): a
    * rule-based approximation of KSS's punct backend
    * (`text_spliter.py:54-68`), with the KSS behaviors that matter most
    * for Korean text (parity vectors in TextChunkerSpec):
    *
    *  - split AFTER terminal punctuation runs `.!?…。！？`, keeping up
    *    to two closing quotes/brackets (`"’”)］」』》`) attached to the
    *    sentence they close;
    *  - do NOT split when the quote is followed by a continuation
    *    particle (`라고/이라고/고/하고/며/면서` — reported speech reads on:
    *    `그는 "안녕하세요."라고 말했다` is ONE sentence in KSS);
    *  - split at whitespace after unpunctuated sentence-final endings:
    *    `~요/~죠` (KSS's README example splits `...맛있었어요 다만,`)
    *    EXCEPT the connective endings `~구요/~고요` which continue the
    *    sentence (`...평범했구요 갈비탕과...` stays joined); and `~다`
    *    ONLY under unambiguous verbal morphology — preceding syllable
    *    with ㅆ-batchim (past `~았다/~었다/~였다`: 왔다/했다/있다...) or
    *    `~니다/~겠다` — because bare `다` also ends common nouns
    *    (바다, 소다), so splitting every `다 ` would cut mid-sentence;
    *  - newline fallback when no terminal punctuation exists, matching
    *    the reference's KSS-failure fallback (`text_spliter.py:64-68`).
    * Blank-stripped like the reference. */
  def splitSentences(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val hasTerminal = text.exists(c => ".!?…。！？".indexOf(c.toInt) >= 0)
    val base: Seq[String] =
      if (hasTerminal) PunctSplit.split(text).toSeq
      else text.split('\n').toSeq
    base.flatMap(p => KoEndingSplit.split(p).toSeq)
      .map(_.trim).filter(_.nonEmpty)
  }

  // precompiled split patterns — splitSentences runs per row inside a
  // UDF, so String.split(regex)'s per-call Pattern.compile would burn
  // CPU on every document
  private val PunctSplit: java.util.regex.Pattern = {
    val punct = "\\.!\\?…。！？"
    val closers = "\"'”’\\)\\]」』》"
    // after punct(+closers), not mid-run, not before a continuation
    java.util.regex.Pattern.compile(
      s"(?<=[$punct][$closers]{0,2})(?![$punct$closers])(?!라고|이라고|고[\\s,]|하고|며[\\s,]|면서)")
  }
  private val KoEndingSplit: java.util.regex.Pattern = {
    // unpunctuated sentence-final endings before whitespace:
    //  - 요/죠, minus connective 구요/고요;
    //  - 다 only after clear verbal morphology: a ㅆ-batchim syllable
    //    (Hangul syllable layout: (c-0xAC00)%28 == 20 → 왔/했/였/있/없…)
    //    or 니/겠 (~니다/~겠다). Noun-final 다 (바다…) must not split.
    val ssBatchim = (0xAC00 to 0xD7A3).filter(c => (c - 0xAC00) % 28 == 20)
      .map(_.toChar).mkString
    java.util.regex.Pattern.compile(
      s"(?:(?<=(?<![구고])[요죠])|(?<=[${ssBatchim}니겠]다))\\s+(?=\\S)")
  }

  /** B5: greedy sentence packing with overlap — faithful re-expression of
    * `KoreanSentenceSplitter._merge_sentences` (`text_spliter.py:80-166`):
    *  - a sentence longer than `chunkSize` flushes the current chunk and
    *    becomes its own (oversize) chunk;
    *  - otherwise sentences pack greedily while
    *    `len + sep + sentence <= chunkSize`;
    *  - on flush, the new chunk is seeded with trailing sentences of the
    *    previous chunk totalling ≤ `overlap` chars;
    *  - if the current sentence does not fit even after overlap seeding,
    *    the overlap-only chunk is flushed and the sentence starts alone.
    */
  def mergeSentences(sentences: Seq[String], chunkSize: Int = 500,
                     overlap: Int = 100, sep: String = " "): Seq[String] = {
    val chunks = ArrayBuffer.empty[String]
    var cur = Vector.empty[String]
    var curLen = 0
    val sepLen = sep.length

    def lenWith(base: Int, nonEmpty: Boolean, s: String): Int =
      base + s.length + (if (nonEmpty) sepLen else 0)

    for (sentence <- sentences) {
      if (sentence.length > chunkSize) {
        if (cur.nonEmpty) chunks += cur.mkString(sep)
        chunks += sentence
        cur = Vector.empty; curLen = 0
      } else if (lenWith(curLen, cur.nonEmpty, sentence) <= chunkSize) {
        cur = cur :+ sentence
        curLen = lenWith(curLen, cur.length > 1, sentence)
      } else {
        if (cur.nonEmpty) chunks += cur.mkString(sep)
        // overlap seed: trailing sentences of `cur` totalling <= overlap
        var seed = Vector.empty[String]
        var seedLen = 0
        var j = cur.length - 1
        var stop = false
        while (j >= 0 && !stop) {
          val cand = lenWith(seedLen, seed.nonEmpty, cur(j))
          if (cand <= overlap) { seed = cur(j) +: seed; seedLen = cand; j -= 1 }
          else stop = true
        }
        val withSentence = lenWith(seedLen, seed.nonEmpty, sentence)
        if (withSentence <= chunkSize) {
          cur = seed :+ sentence; curLen = withSentence
        } else {
          if (seed.nonEmpty) chunks += seed.mkString(sep)
          cur = Vector(sentence); curLen = sentence.length
        }
      }
    }
    if (cur.nonEmpty) chunks += cur.mkString(sep)
    chunks.map(_.trim).toSeq
  }

  /** B4+B5 composed, as the reference's `split_text` (`text_spliter.py:70-78`). */
  def chunkText(text: String, chunkSize: Int = 500, overlap: Int = 100): Seq[String] =
    mergeSentences(splitSentences(text), chunkSize, overlap)

  /** B4-B6 as a DataFrame op: documents(docIdCol, textCol, ...) → one row
    * per chunk with `chunk_index` (0-based per doc) and `content`,
    * carrying all other input columns (metadata enrichment,
    * `document_processor.py:141-150`). Narrow map stage — no shuffle. */
  def chunkDocuments(docs: DataFrame, textCol: String = "text",
                     chunkSize: Int = 500, overlap: Int = 100): DataFrame = {
    val spark = docs.sparkSession
    val chunker = udf((text: String) => chunkText(text, chunkSize, overlap))
    docs
      .withColumn("__chunks", chunker(col(textCol)))
      .select(col("*"), posexplode(col("__chunks")).as(Seq("chunk_index", "content")))
      .drop("__chunks", textCol)
  }
}
