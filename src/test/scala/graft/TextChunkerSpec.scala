package graft

import graft.operators.TextChunker._

/** B4/B5 chunker spec — edge cases mirror the reference's merge logic
  * (`text_spliter.py:80-166`): oversize sentence, exact fit, overlap
  * rebuild, no-fit-even-with-overlap. Property cases are generated with
  * seeded randomness (deterministic; scalacheck-style without the
  * scalatestplus bridge, which is not in the offline cache). */
class TextChunkerSpec extends SparkSpec {
  import spark.implicits._

  /** 200 deterministic random sentence lists. */
  private def forAllSentences(maxLen: Int)(check: List[String] => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val sents = List.fill(rnd.nextInt(20) + 1)(
        List.fill(rnd.nextInt(maxLen) + 1)(('a' + rnd.nextInt(26)).toChar).mkString)
      check(sents)
    }
  }

  // ------------------------------------------------------------ B4 split

  test("splitSentences: terminal punctuation, keeping delimiter") {
    assert(splitSentences("Hello there. How are you? Fine!") ===
      Seq("Hello there.", "How are you?", "Fine!"))
  }

  test("splitSentences: newline fallback when no terminal punctuation") {
    assert(splitSentences("line one\nline two\n\nline three") ===
      Seq("line one", "line two", "line three"))
  }

  test("splitSentences: Korean terminal marks and ellipsis") {
    assert(splitSentences("안녕하세요。반갑습니다！어서오세요？") ===
      Seq("안녕하세요。", "반갑습니다！", "어서오세요？"))
    assert(splitSentences("wait… what. ok") === Seq("wait…", "what.", "ok"))
  }

  test("splitSentences: blanks dropped, empty input") {
    assert(splitSentences("") === Seq.empty)
    assert(splitSentences("   \n  \n") === Seq.empty)
    assert(splitSentences(null) === Seq.empty)
  }

  // ---------------------------------------------- B4 KSS parity vectors
  //
  // Expected outputs below are what KSS (the reference's splitter,
  // text_spliter.py:54-62) produces on its own published examples —
  // the parity table for this rule-based approximation:
  //
  //   vector                              | KSS          | this splitter
  //   ------------------------------------+--------------+--------------
  //   README 3-sentence restaurant review | 3 sentences  | 3 (same cuts)
  //   unpunctuated ~어요 before 다만       | split        | split
  //   connective ~구요 mid-sentence        | no split     | no split
  //   "quoted."라고 reported speech        | no split     | no split
  //   closing quote after terminal punct  | attached     | attached

  test("KSS parity: README example — unpunctuated 어요/구요 endings") {
    val text = "회사 동료 분들과 다녀왔는데 분위기도 좋고 음식도 맛있었어요 다만, " +
      "역시 토요일 저녁이라 사람이 많았습니다. 실내 인테리어는 평범했구요 " +
      "갈비탕과 냉면, 육회비빔밥이 맛있습니다."
    assert(splitSentences(text) === Seq(
      "회사 동료 분들과 다녀왔는데 분위기도 좋고 음식도 맛있었어요",
      "다만, 역시 토요일 저녁이라 사람이 많았습니다.",
      "실내 인테리어는 평범했구요 갈비탕과 냉면, 육회비빔밥이 맛있습니다."))
  }

  test("KSS parity: reported speech — quote + 라고 continues the sentence") {
    assert(splitSentences("그는 \"안녕하세요.\"라고 말했다. 그리고 떠났다.") ===
      Seq("그는 \"안녕하세요.\"라고 말했다.", "그리고 떠났다."))
  }

  test("KSS parity: closing quotes/brackets stay with their sentence") {
    assert(splitSentences("그녀는 \"좋아요!\" 그리고 웃었다.") ===
      Seq("그녀는 \"좋아요!\"", "그리고 웃었다."))
    assert(splitSentences("(이것은 예시다.) 다음 문장이다.") ===
      Seq("(이것은 예시다.)", "다음 문장이다."))
  }

  test("KSS parity: unpunctuated verbal endings split at whitespace") {
    // ㅆ-batchim past (왔다), ~겠죠, ~가요, ~합니다 all split; the final
    // fragment has no terminal ending and stays as the tail sentence
    assert(splitSentences("어제 비가 왔다 내일도 맑겠죠 모두 나들이 가요 좋은 하루") ===
      Seq("어제 비가 왔다", "내일도 맑겠죠", "모두 나들이 가요", "좋은 하루"))
    assert(splitSentences("처음 뵙겠습니다 잘 부탁드립니다") ===
      Seq("처음 뵙겠습니다", "잘 부탁드립니다"))
  }

  test("KSS parity: noun-final 다 must NOT split mid-sentence (over-split regression)") {
    // 바다 (sea) and 다(all) end in 다 without verbal morphology — a
    // naive 다-split would cut these sentences apart
    assert(splitSentences("나는 바다 근처에 산다.") === Seq("나는 바다 근처에 산다."))
    assert(splitSentences("거의 다 왔다고 말했다.") === Seq("거의 다 왔다고 말했다."))
    // plain-form 좋다 is ambiguous with nouns → conservatively no split
    assert(splitSentences("날씨가 좋다 그리고 맑다") === Seq("날씨가 좋다 그리고 맑다"))
  }

  test("bpeishTokens: GPT-2-style pre-token boundaries") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "don't stop, it's 42 tokens!")).toDF("id", "t")
    val toks = df.select(TextAnalysis.bpeishTokens($"t")).head().getSeq[String](0)
    assert(toks === Seq("don", "'t", " stop", ",", " it", "'s", " 42", " tokens", "!"))
    val empty = Seq((1L, "")).toDF("id", "t")
    assert(empty.select(TextAnalysis.bpeishTokenCount($"t")).head().getInt(0) === 0)
  }

  // ------------------------------------------------------------ B5 merge

  test("merge: greedy pack within chunkSize") {
    // 3+1+3=7 <= 10 packs; adding next 3+1 would be 11 > 10 → flush
    val out = mergeSentences(Seq("aaa", "bbb", "ccc"), chunkSize = 10, overlap = 0)
    assert(out === Seq("aaa bbb", "ccc"))
  }

  test("merge: exact fit boundary") {
    val out = mergeSentences(Seq("aaaa", "bbbb"), chunkSize = 9, overlap = 0)
    assert(out === Seq("aaaa bbbb")) // 4+1+4 = 9 == chunkSize
  }

  test("merge: oversize sentence becomes its own chunk, flushing current") {
    val big = "x" * 20
    val out = mergeSentences(Seq("aaa", big, "bbb"), chunkSize = 10, overlap = 0)
    assert(out === Seq("aaa", big, "bbb"))
  }

  test("merge: overlap seeds next chunk with trailing sentences") {
    // chunkSize 12, overlap 5: "aaa bbb ccc" fills (11), "ddd" doesn't fit
    // → flush, seed with trailing sentences totalling <=5 chars: "ccc"
    val out = mergeSentences(Seq("aaa", "bbb", "ccc", "ddd"), chunkSize = 12, overlap = 5)
    assert(out === Seq("aaa bbb ccc", "ccc ddd"))
  }

  test("merge: sentence not fitting even with overlap starts alone") {
    // overlap seed "cccccc" (6) + "dddddddd" (8) = 15 > chunkSize 12
    // → the overlap-only chunk is flushed as its own chunk (reference
    // behavior, text_spliter.py:151-153), then the sentence starts alone
    val out = mergeSentences(Seq("aaaa", "cccccc", "dddddddd"), chunkSize = 12, overlap = 7)
    assert(out === Seq("aaaa cccccc", "cccccc", "dddddddd"))
  }

  test("merge: empty input") {
    assert(mergeSentences(Seq.empty) === Seq.empty)
  }

  // ----------------------------------------------------------- properties

  test("property: chunk length <= max(chunkSize, longest sentence)") {
    forAllSentences(30) { sents =>
      val longest = sents.map(_.length).max
      val chunks = mergeSentences(sents, chunkSize = 40, overlap = 10)
      assert(chunks.forall(_.length <= math.max(40, longest)))
    }
  }

  test("property: every sentence appears in some chunk") {
    forAllSentences(30) { sents =>
      val joined = mergeSentences(sents, chunkSize = 40, overlap = 10).mkString(" ")
      assert(sents.forall(joined.contains))
    }
  }

  test("property: overlap seed of chunk i+1 is a token-suffix of chunk i within budget") {
    // DISTINCT sentences (index-prefixed) make the prefix/suffix match
    // unambiguous, so the seed is identified exactly and the <=overlap
    // budget is genuinely asserted (with repeats it would be vacuous).
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 200) {
      val sents = (0 until rnd.nextInt(15) + 2).map { i =>
        s"s$i" + List.fill(rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString
      }.toList
      val chunks = mergeSentences(sents, chunkSize = 30, overlap = 12).map(_.split(" ").toList)
      chunks.sliding(2).foreach {
        case List(prev, next) =>
          // unique sentences: the longest prefix of `next` that is a
          // suffix of `prev` IS the overlap seed
          val seed = (next.indices.map(i => next.take(i + 1)) :+ Nil)
            .filter(p => prev.endsWith(p)).maxBy(_.length)
          val seedChars = seed.map(_.length).sum + math.max(0, seed.length - 1)
          assert(seedChars <= 12,
            s"seed '${seed.mkString(" ")}' exceeds overlap budget in $chunks")
        case _ => ()
      }
    }
  }

  // --------------------------------------------------------- DataFrame op

  test("chunkDocuments: explodes with per-doc chunk_index, keeps metadata") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val chunks = chunkDocuments(docs, chunkSize = 100, overlap = 20)
    assert(chunks.columns.toSet ===
      Set("doc_id", "lang", "source", "n_chars", "chunk_index", "content"))
    import org.apache.spark.sql.functions._
    // chunk_index is 0-based and dense per doc
    val bad = chunks.groupBy(col("doc_id"))
      .agg(min(col("chunk_index")).as("mn"), max(col("chunk_index")).as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.isEmpty)
    assert(chunks.count() > 0)
  }

  test("repetition signals: planted repeated phrase dominates, degenerate docs are 0") {
    import graft.operators.TextAnalysis._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),      // 7 bigrams: "buy now"×4, "now buy"×3
      (2L, "all tokens here are fully distinct ok"), // 6 distinct bigrams
      (3L, "one"),                                   // <2 tokens → no bigrams
      (4L, "")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        topBigramCount(col("text")).as("n"),
        topBigramFraction(col("text")).as("top_frac"),
        dupBigramFraction(col("text")).as("dup_frac"))
      .as[(Long, Int, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((4, 4.0 / 7, 5.0 / 7)))
    assert(out(2L) === ((1, 1.0 / 6, 0.0)))
    assert(out(3L) === ((0, 0.0, 0.0)))
    assert(out(4L) === ((0, 0.0, 0.0)))
    // the corpus-scale aggregation form must agree exactly with the
    // scalar expressions — on the planted docs AND a real-fixture slice
    def viaProfile(d: org.apache.spark.sql.DataFrame) =
      repetitionProfile(d).as[(Long, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._3.toInt, r._4, r._5))).toMap
    assert(viaProfile(df) === out)
    val slice = Tables.documents(spark, sfDir).limit(40).select($"doc_id", $"text")
    val viaExpr = slice.select(col("doc_id"),
        topBigramCount(col("text")).as("n"),
        topBigramFraction(col("text")).as("tf"),
        dupBigramFraction(col("text")).as("df"))
      .as[(Long, Int, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(viaProfile(slice) === viaExpr)
  }

  test("ngramNovelty: hand-computed rare fractions; short docs absent; trigrams") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b c d"),   // bigrams: "a b" "b c" "c d"
      (2L, "a b x y"),   // bigrams: "a b" "b x" "x y"
      (3L, "one"),       // no bigrams -> absent
      (4L, "")
    ).toDF("doc_id", "text")
    // corpus freq: "a b"=2, others=1; rareThreshold=1 -> rare = freq 1
    val out = TextAnalysis.ngramNovelty(df, rareThreshold = 1L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      1L -> ((3L, 2L, 2.0 / 3)),
      2L -> ((3L, 2L, 2.0 / 3))))
    // threshold includes the shared bigram -> everything rare
    val all = TextAnalysis.ngramNovelty(df, rareThreshold = 2L)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(all === Map(1L -> 1.0, 2L -> 1.0))
    // trigrams: doc 1 has 2, doc 2 has 2, none shared
    val tri = TextAnalysis.ngramNovelty(df, n = 3, rareThreshold = 1L)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._4))).toMap
    assert(tri === Map(1L -> ((2L, 1.0)), 2L -> ((2L, 1.0))))
    intercept[IllegalArgumentException](TextAnalysis.ngramNovelty(df, n = 0))
  }
}
