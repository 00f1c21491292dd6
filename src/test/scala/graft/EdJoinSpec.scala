package graft

import org.apache.spark.sql.functions._

import graft.operators.EdJoin

/** Ed-Join edit-distance similarity join: losslessness of the
  * prefix-prefix filter vs brute force, the τ boundary, random-edit
  * recall, the sub-q-gram short-string path, and input hygiene. */
class EdJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: org.apache.spark.sql.DataFrame,
                    tau: Int): Seq[(Long, Long, Long)] = {
    val a = docs.select($"doc_id".as("id_a"), $"text".as("ta"))
    val b = docs.select($"doc_id".as("id_b"), $"text".as("tb"))
    a.join(b, $"id_a" < $"id_b" &&
        abs(length($"ta") - length($"tb")) <= tau)
      .withColumn("edit_dist", levenshtein($"ta", $"tb", tau).cast("long"))
      .filter($"edit_dist" >= 0)
      .select($"id_a", $"id_b", $"edit_dist")
      .as[(Long, Long, Long)].collect().toSeq.sorted
  }

  test("operator == brute force on the fixture corpus (tau=10)") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 10)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val want = brute(docs, 10)
    assert(got === want)
    assert(want.nonEmpty, "fixture should contain near-dup pairs within tau")
  }

  test("tau boundary: distance exactly tau kept, tau+1 dropped") {
    val docs = Seq(
      (1L, "abcdefghij"),   // vs 2: 2 substitutions
      (2L, "abXdefghiY"),
      (3L, "zzzzzzzzzz")    // far from both
    ).toDF("doc_id", "text")
    val at2 = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(at2 === Seq((1L, 2L, 2L)))
    val at1 = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 1)
      .collect()
    assert(at1.isEmpty)
  }

  test("bag-filter losslessness edges: transpositions (bag 0 < ed), " +
    "bucket-colliding code points, and multi-byte text == brute force") {
    // the histogram filter buckets code points mod 64: 'a' (97) and
    // 'á' (225) collide, so a substitution between them leaves the
    // bucketed bag at 0 — the filter must PASS such pairs and leave
    // the verdict to the DP. Transposed strings likewise have bag 0
    // while ed = 2. Both shapes would expose an over-tight bound.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight ok"),
      (2L, "the quick brown fox jumps over the lazy dog tonighto k"), // transposition, ed 2
      (3L, "the quick brown fox jumps over the lázy dog tonight ok"), // a->á (collides mod 64)
      (4L, "τhe quick brown fox jumps over the lazy dog tonight ok"), // multi-byte sub
      (5L, "a completely different sentence that shares nothing at"),
      (6L, "ab"), (7L, "ba") // short path: transposition below q*(tau+1)
    ).toDF("doc_id", "text")
    for (tau <- Seq(2, 3, 10)) {
      val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(got === brute(docs, tau), s"tau=$tau")
    }
    // and every pair the DP keeps is genuinely within tau of a twin
    val at2 = EdJoin.editDistanceJoin(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(at2.contains((1L, 2L, 2L)) && at2.contains((1L, 3L, 1L)) &&
      at2.contains((1L, 4L, 1L)) && at2.contains((6L, 7L, 2L)))
  }

  test("random-edit recall: every pair built by <= tau edits is found") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abcdefgh"
    val rows = (0 until 20).flatMap { g =>
      val base = Seq.fill(30 + rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val edited = {
        val sb = new StringBuilder(base)
        (1 to 1 + rnd.nextInt(5)).foreach { _ =>
          rnd.nextInt(3) match {
            case 0 if sb.nonEmpty => // substitute
              sb.setCharAt(rnd.nextInt(sb.length), alphabet(rnd.nextInt(8)))
            case 1 if sb.nonEmpty => // delete
              sb.deleteCharAt(rnd.nextInt(sb.length))
            case _ => // insert
              sb.insert(rnd.nextInt(sb.length + 1), alphabet(rnd.nextInt(8)))
          }
        }
        sb.toString
      }
      Seq((g.toLong * 2, base), (g.toLong * 2 + 1, edited))
    }
    val docs = rows.toDF("doc_id", "text")
    val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    (0 until 20).foreach { g =>
      assert(got.contains((g.toLong * 2, g.toLong * 2 + 1)),
        s"edited pair of group $g not found")
    }
    // and nothing outside brute force
    assert(got === brute(docs, 5).map(t => (t._1, t._2)).toSet)
  }

  test("strings with fewer than q*tau+1 grams are not lost (survival-lemma cutoff)") {
    // the prefix of a 5-char string at q=3 is ALL 3 of its grams and
    // one substitution can destroy all of them: 'abcde' vs 'abXde'
    // share no gram string — only the short path can find the pair
    val docs = Seq((1L, "abcde"), (2L, "abXde"), (3L, "qqqqq"))
      .toDF("doc_id", "text")
    val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 1)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 2L, 1L)))
    // and the mixed case: one side short of a full prefix, one not
    val mixed = Seq((1L, "abcdefgh"), (2L, "abcdefghXXXXXXXXXXXXXXXXXXXXXXXXXXXX"))
      .toDF("doc_id", "text")
    assert(EdJoin.editDistanceJoin(mixed, "doc_id", "text", tau = 2)
      .collect().isEmpty) // distance 28 — sanity that nothing false-positives
    val mixed2 = Seq((1L, "abcdefgh"), (2L, "abYdefgh"))
      .toDF("doc_id", "text")
    assert(EdJoin.editDistanceJoin(mixed2, "doc_id", "text", tau = 2)
      .as[(Long, Long, Long)].collect().toSeq === Seq((1L, 2L, 1L)))
  }

  test("random-edit recall on SHORT strings (below q*(tau+1)) == brute force") {
    val rnd = new scala.util.Random(43)
    val alphabet = "abcd"
    val rows = (0 until 15).flatMap { g =>
      val base = Seq.fill(4 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val sb = new StringBuilder(base)
      (1 to 1 + rnd.nextInt(3)).foreach { _ =>
        if (sb.nonEmpty) sb.setCharAt(rnd.nextInt(sb.length),
          alphabet(rnd.nextInt(4)))
      }
      Seq((g.toLong * 2, base), (g.toLong * 2 + 1, sb.toString))
    }
    val docs = rows.toDF("doc_id", "text")
    val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute(docs, 3))
  }

  test("short strings below the gram width pair correctly") {
    val docs = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abcd"),
      (5L, "xyzw")).toDF("doc_id", "text")
    val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute(docs, 2))
    // ""~"a" (1), ""~"ab" (2), "a"~"ab" (1), "ab"~"abcd" (2) must be in
    val pairs = got.map(t => (t._1, t._2)).toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).subsetOf(pairs))
  }

  test("exact-twin collapse: duplicate-heavy corpus == brute force (incl. distance-0 pairs)") {
    // 4 classes: two twin groups of sizes 3 and 4 within tau of each
    // other, plus two singletons (one near, one far)
    val rows =
      (0 until 3).map(i => (10L + i, "the quick brown fox jumps")) ++
      (0 until 4).map(i => (20L + i, "the quick brown fax jumps")) ++
      Seq((30L, "the quick brown fox jumpers"),
          (40L, "completely unrelated text zzz"))
    val docs = rows.toDF("doc_id", "text")
    val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 3)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute(docs, 3))
    // intra-class pairs all at distance 0, cross-class at their true d
    assert(got.count(_._3 == 0L) === 3 + 6)
    assert(got.contains((10L, 20L, 1L)) && got.contains((12L, 23L, 1L)))
    // even tau = 0 keeps the twins
    val zero = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 0)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(zero === brute(docs, 0))
    assert(zero.nonEmpty && zero.forall(_._3 == 0L))
  }

  test("null ids and null texts are ignored, not joined or crashed on") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "hello world"),
      (java.lang.Long.valueOf(2L), "hello worlD"),
      (null.asInstanceOf[java.lang.Long], "hello world"),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L)))
  }

  test("guards: negative tau, non-positive q") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = -1))
    intercept[IllegalArgumentException](
      EdJoin.editDistanceJoin(docs, "doc_id", "text", tau = 1, q = 0))
  }
}
