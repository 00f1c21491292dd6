package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE-induction spec: merges match an independent naive reference,
  * training is deterministic, greedy encode replays training for
  * in-vocab words, and the caps behave. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: naive BPE over the RAW word list (no
    * vocab weighting code path shared with the implementation). */
  private def naiveBpe(corpus: Seq[String], nMerges: Int): Seq[(String, String)] = {
    var words = corpus.map(_.map(_.toString).toArray).toArray
    (0 until nMerges).flatMap { _ =>
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { syms =>
        syms.indices.dropRight(1).foreach { i =>
          val k = (syms(i), syms(i + 1)); counts(k) = counts.getOrElse(k, 0L) + 1
        }
      }
      if (counts.isEmpty) None
      else {
        val best = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        words = words.map { syms =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toArray
        }
        Some(best)
      }
    }
  }

  private val tinyCorpus = Seq("low", "low", "low", "low", "lower", "lower",
    "lowest", "newest", "newest", "newest", "widest")

  test("merges match the naive reference on a classic corpus") {
    val docs = Seq(tinyCorpus.mkString(" ")).toDF("text")
    val learned = Bpe.train(docs, "text", nMerges = 8)
      .map(m => (m.left, m.right))
    assert(learned === naiveBpe(tinyCorpus, 8))
  }

  test("training is deterministic on fixture documents") {
    val docs = Tables.documents(spark, sfDir)
    val a = Bpe.train(docs, "text", nMerges = 16)
    val b = Bpe.train(docs, "text", nMerges = 16)
    assert(a === b)
    assert(a.size === 16)
    // ranks are dense and counts non-increasing is NOT required (later
    // merges can beat earlier residual counts), but ranks must be 0..15
    assert(a.map(_.rank) === (0 until 16))
  }

  test("greedy encode replays training state for in-vocab words") {
    val docs = Seq(tinyCorpus.mkString(" ")).toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 6)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // training replay: apply merges in rank order to each word
    tinyCorpus.distinct.foreach { w =>
      var syms = w.map(_.toString).toArray
      merges.foreach { m =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == m.left && syms(i + 1) == m.right) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
      assert(Bpe.encodeWord(w, ranks) === syms.toSeq,
        s"greedy encode diverged from training replay for '$w'")
    }
  }

  test("encodeColumn tokenizes per word and handles empty text") {
    val docs = Seq(tinyCorpus.mkString(" ")).toDF("text")
    val merges = Bpe.train(docs, "text", nMerges = 6)
    val out = Seq("low newest", "", "low").toDF("text")
      .select(Bpe.encodeColumn(col("text"), merges).as("toks"))
      .as[Seq[String]].collect()
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    assert(out(0) === (Bpe.encodeWord("low", ranks) ++ Bpe.encodeWord("newest", ranks)))
    assert(out(1) === Seq.empty)
    assert(out(2) === Bpe.encodeWord("low", ranks))
  }

  test("minCount and maxVocab caps restrict the training vocabulary") {
    val docs = Seq(("aa aa aa bb")).toDF("text")
    // bb (count 1) excluded -> only 'aa' pairs can be learned
    val merges = Bpe.train(docs, "text", nMerges = 4, minCount = 2L)
    assert(merges.map(m => (m.left, m.right)) === Seq(("a", "a")))
    // maxVocab=1 keeps only the most frequent word
    val m2 = Bpe.train(docs, "text", nMerges = 4, maxVocab = 1)
    assert(m2.map(m => (m.left, m.right)) === Seq(("a", "a")))
  }
}
