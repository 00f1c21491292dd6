package graft

import org.apache.spark.sql.functions._

import graft.operators.WordPiece

/** WordPiece tokenizer: greedy longest-match kernel vs BERT's
  * published behavior, training invariants (likelihood score,
  * determinism, merge bookkeeping), encode plumbing, persistence. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(word: String, vocab: Seq[String],
                  maxWordLen: Int = 100): Seq[String] =
    WordPiece.encodeWord(word, vocab.toSet,
      WordPiece.maxMatchLen(vocab), maxWordLen)

  test("greedy longest-match: the BERT paper vector") {
    // the canonical example: un ##aff ##able
    val vocab = Seq("un", "##aff", "##able", "u", "##n", "##a", "##f",
      "##b", "##l", "##e")
    assert(enc("unaffable", vocab) === Seq("un", "##aff", "##able"))
  }

  test("longest match wins over a shorter prefix at every position") {
    val vocab = Seq("a", "ab", "abc", "##c", "##bc", "##b")
    // position 0: 'abc' beats 'ab' beats 'a'
    assert(enc("abc", vocab) === Seq("abc"))
    // after 'ab' would come ##c, but greedy takes abc whole; force the
    // continuation path with a 4-char word: abcb -> abc ##b
    assert(enc("abcb", vocab) === Seq("abc", "##b"))
  }

  test("[UNK] on an unmatchable position and on a too-long word") {
    val vocab = Seq("a", "##b")
    assert(enc("abz", vocab) === Seq(WordPiece.Unk))   // no piece for z
    assert(enc("ba", vocab) === Seq(WordPiece.Unk))    // no initial b
    assert(enc("ab", vocab, maxWordLen = 1) === Seq(WordPiece.Unk))
    assert(enc("ab", vocab, maxWordLen = 2) === Seq("a", "##b"))
    assert(enc("", vocab) === Seq.empty)
  }

  test("code points, not UTF-16 chars: surrogate-pair text segments cleanly") {
    val bee = new String(Character.toChars(0x1F41D)) // outside the BMP
    val vocab = Seq(bee, "##" + bee, "x", "##x")
    assert(enc(bee + "x" + bee, vocab) === Seq(bee, "##x", "##" + bee))
    // maxWordLen counts code points: 3 cps pass a len-3 cutoff even
    // though the UTF-16 length is 5
    assert(enc(bee + "x" + bee, vocab, maxWordLen = 3).length === 3)
  }

  test("non-UNK encodings reconstruct the word and use only vocab pieces") {
    val docs = Tables.documents(spark, sfDir).limit(120)
    val vocab = WordPiece.trainVocabulary(docs, "text", nMerges = 32)
    val vset = vocab.toSet
    val maxLen = WordPiece.maxMatchLen(vocab)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      val ps = WordPiece.encodeWord(w, vset, maxLen, maxWordLen = 100)
      if (ps != Seq(WordPiece.Unk)) {
        assert(ps.forall(vset.contains), s"non-vocab piece for '$w'")
        assert(ps.head.nonEmpty && !ps.head.startsWith("##"))
        assert(ps.tail.forall(_.startsWith("##")), s"bare continuation in '$w'")
        val rebuilt = ps.head + ps.tail.map(_.substring(2)).mkString
        assert(rebuilt === w, s"reconstruction forked for '$w'")
      }
    }
  }

  test("training: likelihood score rule on a hand-checkable vocab") {
    // counts: pair (a,##b) appears in every 'ab' (n=10); pair (c,##d)
    // in every 'cd' (n=10). Symbol counts: a,##b = 10 each; c = 20
    // (from 'cd' and 'ce'), ##d = 10. score(a,##b) = 10/100 >
    // score(c,##d) = 10/200 — frequency alone would tie them, the
    // likelihood denominator must break it toward (a,##b).
    val merges = WordPiece.trainFromVocab(
      Seq(("ab", 10L), ("cd", 10L), ("ce", 10L)), nMerges = 1)
    assert(merges.head.left === "a" && merges.head.right === "##b")
    assert(merges.head.pairCount === 10L)
    assert(merges.head.leftCount === 10L && merges.head.rightCount === 10L)
  }

  test("training is deterministic and merge bookkeeping is consistent") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val a = WordPiece.train(docs, "text", nMerges = 24)
    val b = WordPiece.train(docs, "text", nMerges = 24)
    assert(a === b)
    a.foreach { m =>
      assert(m.pairCount >= 1L)
      assert(m.leftCount >= m.pairCount && m.rightCount >= m.pairCount)
    }
    assert(a.map(_.rank) === a.indices)
    // every merged symbol enters the vocabulary exactly once, after
    // the sorted alphabet
    val vocab = WordPiece.trainVocabulary(docs, "text", nMerges = 24)
    assert(vocab.distinct === vocab)
    a.foreach(m => assert(vocab.contains(WordPiece.mergedSymbol(m.left, m.right))))
  }

  test("encodeColumn == encodeWord composition over the corpus") {
    val docs = Tables.documents(spark, sfDir).limit(80)
    val vocab = WordPiece.trainVocabulary(docs, "text", nMerges = 32)
    val vset = vocab.toSet
    val maxLen = WordPiece.maxMatchLen(vocab)
    val viaColumn = docs
      .select($"doc_id", WordPiece.encodeColumn($"text", vocab,
        maxWordLen = WordPiece.GateMaxWordLen).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .foreach { case (id, text) =>
        val want = text.split(" ").filter(_.nonEmpty).toSeq
          .flatMap(w => WordPiece.encodeWord(w, vset, maxLen,
            WordPiece.GateMaxWordLen))
        assert(viaColumn(id) === want, s"doc $id")
      }
  }

  test("the gate maxWordLen actually exercises [UNK] on fixture data") {
    val docs = Tables.documents(spark, sfDir)
    val vocab = WordPiece.trainVocabulary(docs, "text", nMerges = 64)
    val unks = docs.select(explode(WordPiece.encodeColumn($"text", vocab,
        maxWordLen = WordPiece.GateMaxWordLen)).as("p"))
      .filter($"p" === WordPiece.Unk).count()
    assert(unks > 0L, "gate cutoff no longer reaches any fixture word")
  }

  test("marker invariant: training never mints a bare '##…' symbol") {
    // wpSymbols("##") = [#, ###]; merging them would read "##" — a
    // bare piece conflated with the continuation marker. The pair is
    // refused outright: a '##'-only corpus learns NOTHING…
    assert(WordPiece.trainFromVocab(Seq(("##", 5L)), nMerges = 4).isEmpty)
    // …and a lower-count LEGAL pair wins over the higher-count
    // illegal one instead of the argmax picking the poison merge
    val m = WordPiece.trainFromVocab(Seq(("##", 5L), ("ab", 3L)), nMerges = 1)
    assert(m.head.left === "a" && m.head.right === "##b")
    // end-to-end on a '#'-heavy corpus: no trained piece is ever a
    // bare string reading '##…', and every merge obeys the invariant
    val docs = Seq("## ##x ##x #ab #ab ab", "##x #ab ## ab ab")
      .toDF("text")
    val merges = WordPiece.train(docs, "text", nMerges = 16)
    merges.foreach { mm =>
      assert(!mm.left.startsWith("##") ||
        WordPiece.mergedSymbol(mm.left, mm.right).startsWith("##"))
      assert(mm.left.startsWith("##") ||
        !WordPiece.mergedSymbol(mm.left, mm.right).startsWith("##"))
    }
  }

  test("marker invariant: a '##…' word never seats a continuation at position 0") {
    // "##b" is the DISPLAY of continuation body 'b'; the word "##b"'s
    // own pos-0 span reads the same string. Without the pos-0 guard
    // the greedy scan would emit the single continuation piece
    // ["##b"], breaking head-is-bare and reconstruction. "xyz" only
    // widens the scan bound so length 3 is actually tried.
    val vocab = Seq("#", "###", "##b", "xyz")
    assert(enc("##b", vocab) === Seq("#", "###", "##b"))
    // reconstruction invariant holds corpus-wide on '#'-heavy data
    val docs = Seq("## ##x ##x #ab #ab ab", "##x #ab ## ab ab").toDF("text")
    val tv = WordPiece.trainVocabulary(docs, "text", nMerges = 16)
    val vset = tv.toSet
    val maxLen = WordPiece.maxMatchLen(tv)
    Seq("##", "##x", "#ab", "ab").foreach { w =>
      val ps = WordPiece.encodeWord(w, vset, maxLen, maxWordLen = 100)
      assert(ps.nonEmpty)
      if (ps != Seq(WordPiece.Unk)) {
        assert(!ps.head.startsWith("##"), s"continuation head for '$w'")
        assert(ps.tail.forall(_.startsWith("##")))
        assert(ps.head + ps.tail.map(_.substring(2)).mkString === w)
      }
    }
  }

  test("save/load round-trip preserves the vocabulary") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val vocab = WordPiece.trainVocabulary(docs, "text", nMerges = 16)
    val dir = java.nio.file.Files.createTempDirectory("wp-vocab").toString
    WordPiece.saveVocab(spark, vocab, dir)
    assert(WordPiece.loadVocab(spark, dir) === vocab.sorted)
  }
}
