package graft

import org.apache.spark.sql.functions._

import graft.operators.Positional

/** Positional search: phrase/proximity semantics on hand vectors
  * (overlaps, windows, ties), on-the-fly == persisted-index parity,
  * driver-side range pruning, guards. */
class PositionalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("phrase semantics: overlapping occurrences count") {
    val d = docs(1L -> "a a a", 2L -> "a b a", 3L -> "b b")
    val got = Positional.phraseSearch(d, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L)) // positions 0-1 and 1-2 both match
  }

  test("phrase semantics: trigram, repeated terms, case folding") {
    val d = docs(
      1L -> "Slow hash batch then slow HASH batch",
      2L -> "slow batch hash",
      3L -> "slow hash")
    val got = Positional.phraseSearch(d, "doc_id", "text",
        Seq("slow", "hash", "batch"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L)) // tokenization lowercases; 2/3 lack the trigram
  }

  test("proximity semantics: window inclusive, pair count, min distance") {
    val d = docs(
      1L -> "x q q y x",          // x@0,4  y@3: pairs |0-3|=3, |4-3|=1
      2L -> "x q q q y",          // |0-4|=4 > 3 -> excluded
      3L -> "y x")                // adjacent, distance 1
    val got = Positional.proximitySearch(d, "doc_id", "text", "x", "y", 3L)
      .select($"id", $"n_pairs", $"min_dist")
      .as[(Long, Long, Long)].collect()
      .map { case (id, np, md) => id -> ((np, md)) }.toMap
    assert(got === Map(1L -> ((2L, 1L)), 3L -> ((1L, 1L))))
  }

  test("on-the-fly == persisted index, and the index read prunes ranges") {
    val d = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("pos-idx").toString
    Positional.buildPersistedIndex(d, "doc_id", "text", nRanges = 8, dir)
    for (phrase <- Seq(Seq("table", "hash"), Seq("big", "order", "scan"),
        Seq("customer"))) {
      val fly = Positional.phraseSearch(d, "doc_id", "text", phrase)
        .orderBy($"id").as[(Long, Long)].collect().toSeq
      val idx = Positional.searchPersistedPhrase(spark, dir, phrase)
        .orderBy($"id").as[(Long, Long)].collect().toSeq
      assert(idx === fly, s"phrase $phrase")
      assert(fly.nonEmpty, s"phrase $phrase matches nothing — dead test")
    }
    // proximity parity through the same index
    val flyP = Positional.proximitySearch(d, "doc_id", "text",
        "customer", "join", 3L)
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    val idxP = Positional.searchPersistedProximity(spark, dir,
        "customer", "join", 3L)
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    assert(idxP === flyP && flyP.nonEmpty)
    // driver-side manifest pruning: a single-term read touches a
    // strict subset of the 8 range dirs
    val scan = Positional.readPostings(spark, dir, Seq("table"))
      .queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scan.isDefined, "expected a parquet scan under readPostings")
    val roots = scan.get.relation.location.rootPaths.map(_.toString)
    assert(roots.nonEmpty && roots.size < 8,
      s"expected a pruned range subset, read ${roots.size} ranges")
    // out-of-range terms: empty result, real postings schema
    val none = Positional.readPostings(spark, dir, Seq("zzzzzz…"))
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("id", "term", "pos"))
  }

  test("deleteFromPersistedIndex: delete == rebuild for phrase and " +
    "proximity; untouched ranges not rewritten") {
    val d = Tables.documents(spark, sfDir).limit(200).select($"doc_id", $"text")
    val victims = d.filter($"doc_id" % 7 === 0)
    val survivors = d.filter($"doc_id" % 7 =!= 0)
    val delDir = java.nio.file.Files.createTempDirectory("pos-del").toFile
    val rebDir = java.nio.file.Files.createTempDirectory("pos-delreb").toFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    try {
      // synth doc with unique high terms: its delete must touch ONE range
      val synth = Seq((999999L, "zzzq zzzr zzzq")).toDF("doc_id", "text")
      Positional.buildPersistedIndex(d.unionByName(synth), "doc_id", "text",
        nRanges = 8, delDir.getAbsolutePath)
      Positional.buildPersistedIndex(survivors, "doc_id", "text",
        nRanges = 8, rebDir.getAbsolutePath)
      def files(dir: java.io.File): Map[String, Seq[(String, Long)]] =
        Option(new java.io.File(dir, "postings").listFiles()).getOrElse(Array())
          .filter(x => x.isDirectory && x.getName.startsWith("range_id="))
          .map(x => x.getName -> Option(x.listFiles()).getOrElse(Array())
            .filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified())).sorted.toSeq).toMap
      val before = files(delDir)
      val touchedSynth = Positional.deleteFromPersistedIndex(synth,
        "doc_id", "text", delDir.getAbsolutePath)
      assert(touchedSynth.size === 1,
        s"narrow delete should touch one range (touched $touchedSynth)")
      val after = files(delDir)
      before.keySet
        .filterNot(k => touchedSynth.contains(k.stripPrefix("range_id=").toLong))
        .foreach(k => assert(after(k) === before(k), s"$k rewritten"))
      // broad delete, then parity with the survivor rebuild
      Positional.deleteFromPersistedIndex(victims, "doc_id", "text",
        delDir.getAbsolutePath)
      def post(dir: java.io.File) =
        spark.read.option("basePath", s"${dir.getAbsolutePath}/postings")
          .parquet(s"${dir.getAbsolutePath}/postings")
          .select($"id", $"term", $"pos")
          .as[(Long, String, Long)].collect().sorted.toSeq
      assert(post(delDir) === post(rebDir))
      for (phrase <- Seq(Seq("table", "hash"), Seq("customer"))) {
        val viaDel = Positional.searchPersistedPhrase(spark,
            delDir.getAbsolutePath, phrase)
          .orderBy($"id").as[(Long, Long)].collect().toSeq
        val viaReb = Positional.searchPersistedPhrase(spark,
            rebDir.getAbsolutePath, phrase)
          .orderBy($"id").as[(Long, Long)].collect().toSeq
        assert(viaDel === viaReb, s"phrase $phrase")
        assert(viaDel.nonEmpty, s"phrase $phrase matches nothing — dead test")
      }
      val proxDel = Positional.searchPersistedProximity(spark,
          delDir.getAbsolutePath, "customer", "join", 3L)
        .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
      val proxReb = Positional.searchPersistedProximity(spark,
          rebDir.getAbsolutePath, "customer", "join", 3L)
        .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
      assert(proxDel === proxReb && proxDel.nonEmpty)
    } finally { rm(delDir); rm(rebDir) }
  }

  test("serving phrase/proximity probes == persisted-index batch, zero Spark jobs") {
    import graft.serving.Serving
    val d = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("pos-probe").toString
    Positional.buildPersistedIndex(d, "doc_id", "text", nRanges = 8, dir)
    for (phrase <- Seq(Seq("table", "hash"), Seq("big", "order", "scan"),
        Seq("customer"))) {
      val batch = Positional.searchPersistedPhrase(spark, dir, phrase)
        .orderBy($"id").as[(Long, Long)].collect().toSeq
      val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val probe = Serving.searchPhrase(dir, phrase)
        .map(h => (h.id, h.nOccurrences))
      val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      assert(jobsAfter === jobsBefore, "phrase probe must launch no Spark jobs")
      assert(probe === batch, s"phrase $phrase")
      assert(batch.nonEmpty, s"phrase $phrase matches nothing — dead test")
    }
    // proximity probe parity through the same layout
    val batchP = Positional.searchPersistedProximity(spark, dir,
        "customer", "join", 3L)
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val probeP = Serving.searchProximity(dir, "customer", "join", 3L)
      .map(h => (h.id, h.nPairs, h.minDist))
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      === jobsBefore, "proximity probe must launch no Spark jobs")
    assert(probeP === batchP && batchP.nonEmpty)
    // duplicate-term phrase exercises the same-source branches of both
    val dd = Seq((1L, "a a a b"), (2L, "a b a")).toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("pos-probe2").toString
    Positional.buildPersistedIndex(dd, "doc_id", "text", nRanges = 2, dir2)
    val dupBatch = Positional.searchPersistedPhrase(spark, dir2, Seq("a", "a"))
      .orderBy($"id").as[(Long, Long)].collect().toSeq
    val dupProbe = Serving.searchPhrase(dir2, Seq("a", "a"))
      .map(h => (h.id, h.nOccurrences))
    assert(dupProbe === dupBatch)
    assert(dupBatch === Seq((1L, 2L))) // "a a a" holds "a a" twice
  }

  test("postings explode only emits query-term rows") {
    val d = Tables.documents(spark, sfDir).limit(50)
    val p = Positional.postingsOf(d, "doc_id", "text", Seq("table", "hash"))
    assert(p.select($"term").distinct().as[String].collect().toSet
      .subsetOf(Set("table", "hash")))
    // positions are real token indexes: re-derive one doc by hand
    val row = d.select($"doc_id", $"text").as[(Long, String)].head()
    val toks = row._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val want = toks.zipWithIndex
      .collect { case (t, i) if t == "table" || t == "hash" => (t, i.toLong) }
      .toSet
    val got = p.filter($"id" === row._1).select($"term", $"pos")
      .as[(String, Long)].collect().toSet
    assert(got === want)
  }

  test("guards: empty phrase, same-term proximity, bad window") {
    val d = docs(1L -> "a b")
    intercept[IllegalArgumentException](
      Positional.phraseSearch(d, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](
      Positional.proximitySearch(d, "doc_id", "text", "a", "a", 3L))
    intercept[IllegalArgumentException](
      Positional.proximitySearch(d, "doc_id", "text", "a", "b", 0L))
  }

  test("bestPassage: hand-checkable window, tie to earliest, text slice") {
    //            pos: 0 1 2 3 4 5 6 7
    val d = docs(1L -> "q x q q y y y q",
                 2L -> "q y y y y y y q",
                 3L -> "z z z")
    val got = Positional.bestPassage(d, "doc_id", "text", Seq("q"),
      window = 3L, k = 5).collect()
    // doc 1: [0,3) holds q@0,q@2 and [2,5) holds q@2,q@3 — both 2
    // hits, earliest anchor 0 wins the tie; doc 2: 1 hit everywhere,
    // anchor 0 wins; doc 3: no hits, absent
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val d1 = got.find(_.getLong(0) == 1L).get
    assert(d1.getLong(1) === 2L && d1.getLong(2) === 0L)
    assert(d1.getString(3) === "q x q")
    val d2 = got.find(_.getLong(0) == 2L).get
    assert(d2.getLong(1) === 1L && d2.getLong(2) === 0L)
    assert(d2.getString(3) === "q y y")
  }

  test("bestPassage: hit-anchored spans find the same optimum as an exhaustive scan") {
    val d = Tables.documents(spark, sfDir)
    val terms = Seq("hash", "join", "vector")
    val w = 16
    val got = Positional.bestPassage(d, "doc_id", "text", terms,
      window = w.toLong, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // exhaustive: every start position, not just hits
    val texts = d.select($"doc_id", $"text")
      .as[(Long, String)].collect()
    val best = texts.map { case (id, t) =>
      val ws = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val hit = ws.map(x => if (terms.contains(x)) 1 else 0)
      val m = if (hit.sum == 0) 0
        else ws.indices.map(i => hit.slice(i, i + w).sum).max
      id -> m.toLong
    }.toMap
    got.foreach { case (id, n) => assert(n === best(id), s"doc $id") }
    // and the operator's top hit-count equals the global exhaustive max
    assert(got.values.max === best.values.max)
  }

  test("bestPassage guards") {
    val d = docs(1L -> "a b")
    intercept[IllegalArgumentException](
      Positional.bestPassage(d, "doc_id", "text", Seq.empty, 4L, 5))
    intercept[IllegalArgumentException](
      Positional.bestPassage(d, "doc_id", "text", Seq("a"), 0L, 5))
    intercept[IllegalArgumentException](
      Positional.bestPassage(d, "doc_id", "text", Seq("a"), 4L, 0))
  }
}
