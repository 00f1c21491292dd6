package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram
import graft.operators.Unigram.Piece

/** Unigram-LM tokenizer: Viterbi kernel vs exhaustive enumeration,
  * EM training invariants (coverage, determinism, frequent-word
  * promotion), encode plumbing, persistence + serving probe parity. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Exhaustive best segmentation with the DP's tie rule: max exact
    * score; ties → smallest start of the LAST piece (longest final
    * piece), recursively backwards. */
  private def bruteBest(word: String, pieces: Map[String, Long],
                        maxLen: Int): (Seq[String], Long) = {
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val p = s.substring(0, l)
        if (pieces.contains(p) || l == 1)
          segs(s.substring(l)).map(p :: _)
        else Seq.empty
      }
    def score(seg: List[String]): Long =
      seg.map(p => pieces.getOrElse(p, Unigram.UnkFp)).sum
    // tie comparator: later boundary positions prefer SMALLER start,
    // i.e. compare reversed piece-length sequences descending
    def better(a: List[String], b: List[String]): Boolean = {
      val (sa, sb) = (score(a), score(b))
      if (sa != sb) sa > sb
      else {
        val la = a.reverseIterator.map(_.length).toList
        val lb = b.reverseIterator.map(_.length).toList
        // longer last piece first; walk backwards
        val cmp = la.zip(lb).find { case (x, y) => x != y }
        cmp.exists { case (x, y) => x > y }
      }
    }
    val all = segs(word).map(_.toList)
    val best = all.reduceLeft((x, y) => if (better(y, x)) y else x)
    (best, score(best))
  }

  test("Viterbi == exhaustive enumeration with the tie rule, random vocab") {
    val rnd = new scala.util.Random(31)
    val alphabet = "abc"
    for (trial <- 1 to 60) {
      val word = Seq.fill(2 + rnd.nextInt(7))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      // random piece set over the alphabet incl. all singles
      val pool = (for {
        i <- 0 until word.length; j <- i + 1 to math.min(word.length, i + 4)
      } yield word.substring(i, j)).distinct
      val pieces: Map[String, Long] =
        (alphabet.map(_.toString) ++ rnd.shuffle(pool.toList).take(5))
          .distinct.map(p => p -> (-(1L + rnd.nextInt(20)) * Unigram.FpScale))
          .toMap
      val got = Unigram.encodeWord(word, pieces, maxPieceLen = 4)
      val (want, wantScore) = bruteBest(word, pieces, maxLen = 4)
      assert(got === want, s"trial $trial word $word pieces $pieces")
      assert(Unigram.scoreWord(word, pieces, 4) === wantScore)
    }
  }

  test("unknown characters segment as single-char UNK pieces, never fail") {
    val pieces = Map("ab" -> -1L * Unigram.FpScale, "a" -> -2L * Unigram.FpScale,
      "b" -> -2L * Unigram.FpScale)
    assert(Unigram.encodeWord("axb", pieces) === Seq("a", "x", "b"))
    assert(Unigram.scoreWord("axb", pieces) ===
      -2L * Unigram.FpScale + Unigram.UnkFp + -2L * Unigram.FpScale)
    // a word of ONLY unknown chars still tokenizes
    assert(Unigram.encodeWord("zzz", pieces) === Seq("z", "z", "z"))
  }

  test("tie rule prefers the longer final piece at equal score") {
    // "ab"+"c" vs "a"+"bc": equal total score -> smaller start of the
    // last piece wins = "a","bc"
    val pieces = Map("a" -> -2L * Unigram.FpScale, "b" -> -3L * Unigram.FpScale,
      "c" -> -3L * Unigram.FpScale,
      "ab" -> -3L * Unigram.FpScale, "bc" -> -3L * Unigram.FpScale)
    assert(Unigram.encodeWord("abc", pieces) === Seq("a", "bc"))
  }

  test("train: every corpus character is in the vocab; a dominant word becomes one piece") {
    val docs = Seq.fill(50)("spark spark spark flame").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = Unigram.train(docs, "text", vocabSize = 14, emIters = 3,
      minCount = 2L)
    val pieceSet = vocab.map(_.piece).toSet
    val chars = "sparkflame".map(_.toString).toSet
    assert(chars.subsetOf(pieceSet), s"missing singles in $pieceSet")
    assert(pieceSet.contains("spark"), s"dominant word not promoted: $pieceSet")
    assert(vocab.size <= 14)
    // the dominant word tokenizes to itself
    val m = vocab.map(p => p.piece -> p.logpFp).toMap
    assert(Unigram.encodeWord("spark", m) === Seq("spark"))
  }

  test("train is deterministic: two runs emit the identical table") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val a = Unigram.train(docs, "text", vocabSize = 40)
    val b = Unigram.train(docs, "text", vocabSize = 40)
    assert(a === b)
  }

  test("logp_fp values are negative and finite; probabilities sum below 1 after floor") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val vocab = Unigram.train(docs, "text", vocabSize = 40)
    assert(vocab.nonEmpty)
    vocab.foreach(p => assert(p.logpFp < 0L, s"${p.piece} has ${p.logpFp}"))
    val psum = vocab.map(p => StrictMath.exp(p.logpFp.toDouble / Unigram.FpScale)).sum
    assert(psum <= 1.0 + 1e-9 && psum > 0.5, s"prob mass $psum")
  }

  test("encodeColumn: null text -> empty; counts match per-word kernel") {
    val docs = Seq((1L, "spark flame spark"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val vocab = Seq(Piece("spark", -1L * Unigram.FpScale),
      Piece("flame", -2L * Unigram.FpScale)) ++
      "sparkflame".distinct.map(c => Piece(c.toString, -5L * Unigram.FpScale))
    val out = docs.select($"doc_id",
        Unigram.encodeColumn($"text", vocab).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("spark", "flame", "spark"))
    assert(out(2L) === Seq.empty)
  }

  test("saveVocab/loadVocab roundtrip preserves pieces and logprobs") {
    withTempDir("uni-vocab") { dir =>
      val docs = Tables.documents(spark, sfDir).limit(100)
      val vocab = Unigram.train(docs, "text", vocabSize = 40)
      Unigram.saveVocab(spark, vocab, dir.getPath)
      assert(Unigram.loadVocab(spark, dir.getPath) === vocab.sortBy(_.piece))
    }
  }

  test("serving probe == batch encodeColumn doc for doc, zero Spark jobs") {
    import graft.serving.Serving
    val docs = Tables.documents(spark, sfDir).limit(150)
    val vocab = Unigram.train(docs, "text", vocabSize = 40)
    val dir = java.nio.file.Files.createTempDirectory("uni-serve").toString
    Unigram.saveVocab(spark, vocab, dir)
    val loaded = Unigram.loadVocab(spark, dir)
    val texts = docs.select("doc_id", "text").limit(30).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val batch = docs.limit(30)
      .select($"doc_id", Unigram.encodeColumn($"text", loaded).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val cache = Serving.newCache()
    Serving.encodeUnigram(dir, texts.head._2, cache = cache) // warm
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    texts.foreach { case (id, text) =>
      assert(Serving.encodeUnigram(dir, text, cache = cache) === batch(id),
        s"doc $id")
    }
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter === jobsBefore, "unigram probe must not launch Spark jobs")
    assert(Serving.encodeUnigram(dir, null, cache = cache) === Seq.empty)
    intercept[IllegalArgumentException] {
      Serving.encodeUnigram("/nonexistent/uni-model", "a b")
    }
  }
}
