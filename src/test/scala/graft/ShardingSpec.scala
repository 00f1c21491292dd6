package graft

import org.apache.spark.sql.functions._

import graft.operators.Sharding

/** Shard-export spec: content-addressed determinism, range, hash
  * balance, shuffle-free assignment, and the physical export layout. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("assignment is deterministic and partitioning-independent") {
    val ids = (1L to 500L).toDF("id")
    val once = Sharding.assignShards(ids, "id", 8)
      .as[(Long, Long)].collect().toMap
    val again = Sharding.assignShards(ids.repartition(13), "id", 8)
      .as[(Long, Long)].collect().toMap
    assert(once === again)
    assert(once.values.forall(s => s >= 0 && s < 8))
  }

  test("string and numeric keys agree through the string form") {
    val n = Sharding.assignShards(Seq(42L).toDF("k"), "k", 16)
      .select("shard").as[Long].head()
    val s = Sharding.assignShards(Seq("42").toDF("k"), "k", 16)
      .select("shard").as[Long].head()
    assert(n === s)
  }

  test("hash balance: 10k keys spread within 3x sqrt deviation") {
    val nShards = 16
    val counts = Sharding.assignShards((1L to 10000L).toDF("id"), "id", nShards)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(counts.size === nShards, "every shard is hit")
    val expected = 10000.0 / nShards
    val dev = 3 * math.sqrt(expected)
    counts.values.foreach(c => assert(math.abs(c - expected) <= dev,
      s"shard count $c outside $expected +/- $dev"))
  }

  test("assignment is a narrow projection — no Exchange in the plan") {
    val plan = Sharding.assignShards((1L to 10L).toDF("id"), "id", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("exportSorted: disjoint covering manifest, sorted files, manifest-driven pruning") {
    withTempDir("sorted") { dir =>
      val rnd = new scala.util.Random(5)
      val rows = (1L to 2000L).map(i => (i, rnd.nextInt(100000).toLong))
        .toDF("doc_id", "ts")
      val manifest = Sharding.exportSorted(rows, "ts", nRanges = 4, dir.getAbsolutePath)
        .as[(Int, Long, Long, Long)].collect().sortBy(_._2)
      assert(manifest.map(_._4).sum === 2000L, "manifest covers every row")
      // STRICT: equal boundary keys across two ranges would break
      // manifest-driven point lookups (same key, two dirs)
      manifest.sliding(2).foreach {
        case Array(a, b) => assert(a._3 < b._2, s"ranges overlap: $a vs $b")
        case _ =>
      }
      // within-range files are sorted on the key
      val oneRange = spark.read
        .parquet(s"${dir.getAbsolutePath}/range_id=${manifest.head._1}")
        .select("ts").as[Long].collect()
      assert(oneRange.sameElements(oneRange.sorted))
      // manifest-driven pruning: a point lookup touches ONE range dir
      val probe = rows.select("ts").as[Long].head()
      val hit = manifest.filter(m => m._2 <= probe && probe <= m._3)
      assert(hit.length >= 1)
      val found = spark.read
        .parquet(s"${dir.getAbsolutePath}/range_id=${hit.head._1}")
        .filter($"ts" === probe).count()
      assert(found >= 1)
    }
  }

  test("incrementalExportShards: rewrites only touched shards, equals full re-export") {
    withTempDir("increx") { dir =>
      val path = dir.getAbsolutePath
      val oldDocs = (1L to 400L).map(i => (i, s"text_$i")).toDF("doc_id", "text")
      Sharding.exportShards(oldDocs, "doc_id", nShards = 8, path)
      // new snapshot: edit doc 5, add doc 1000, remove doc 10
      val newDocs = (1L to 400L).filter(_ != 10L)
        .map(i => (i, if (i == 5L) "EDITED" else s"text_$i"))
        .:+((1000L, "text_1000")).toDF("doc_id", "text")
      // file listing of an untouched shard, before
      val changedExpected = Seq(5L, 10L, 1000L)
        .map(id => Sharding.assignShards(Seq(id).toDF("doc_id"), "doc_id", 8)
          .select("shard").as[Long].head()).distinct.sorted
      val untouched = (0L until 8L).filterNot(changedExpected.contains).head
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def filesOf(s: Long) = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$path/shard=$s"))
        .map(f => (f.getPath.getName, f.getModificationTime)).sortBy(_._1).toSeq
      val before = filesOf(untouched)
      val rewritten = Sharding.incrementalExportShards(
        oldDocs, newDocs, "doc_id", nShards = 8, path)
      assert(rewritten === changedExpected, "rewrote a different shard set")
      // untouched shard files byte-identical (names AND mtimes)
      assert(filesOf(untouched) === before, s"untouched shard $untouched rewritten")
      // on-disk content == full re-export of the new snapshot
      val got = spark.read.parquet(path).select("doc_id", "text")
        .as[(Long, String)].collect().sorted.toSeq
      assert(got === newDocs.as[(Long, String)].collect().sorted.toSeq)
      // no changes -> no writes, empty audit
      assert(Sharding.incrementalExportShards(
        newDocs, newDocs, "doc_id", 8, path) === Nil)
      // a NON-text column change must still rewrite its shard
      // (the fingerprint covers ALL non-key columns)
      val base2 = newDocs.withColumn("extra", lit("A"))
      val relabeled = base2.withColumn("extra",
        when($"doc_id" === 3L, lit("B")).otherwise($"extra"))
      Sharding.exportShards(base2, "doc_id", nShards = 8, path)
      val r2 = Sharding.incrementalExportShards(base2, relabeled, "doc_id", 8, path)
      val shard3 = Sharding.assignShards(Seq(3L).toDF("doc_id"), "doc_id", 8)
        .select("shard").as[Long].head()
      assert(r2 === Seq(shard3), "metadata-only change must rewrite the shard")
      assert(spark.read.parquet(path).filter($"doc_id" === 3L)
        .select("extra").as[String].head() === "B")
    }
  }

  test("incrementalExportShards: identical snapshots with a null key rewrite NOTHING") {
    withTempDir("increx-null") { dir =>
      val path = dir.getAbsolutePath
      val docs = ((1L to 30L).map(i => (Some(i), s"t$i")) :+
        ((Option.empty[Long], "null-key payload"))).toDF("doc_id", "text")
      Sharding.exportShards(docs, "doc_id", nShards = 4, path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def allFiles = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val before = {
        val it = allFiles; val b = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) { val f = it.next(); b += s"${f.getPath}@${f.getModificationTime}" }
        b.sorted.toSeq
      }
      // identical snapshots: the null-key row must NOT read as changed
      assert(Sharding.incrementalExportShards(docs, docs, "doc_id", 4, path) === Nil)
      val after = {
        val it = allFiles; val b = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) { val f = it.next(); b += s"${f.getPath}@${f.getModificationTime}" }
        b.sorted.toSeq
      }
      assert(after === before, "no-op incremental export must not touch any file")
      // an actual null-key payload change rewrites ONLY the default partition
      val edited = docs.withColumn("text",
        when($"doc_id".isNull, lit("edited")).otherwise($"text"))
      assert(Sharding.incrementalExportShards(docs, edited, "doc_id", 4, path) === Nil)
      val got = spark.read.parquet(path).filter($"doc_id".isNull)
        .select("text").as[String].head()
      assert(got === "edited")
      assert(spark.read.parquet(path).count() === 31L)
    }
  }

  test("incrementalExportShards: MULTIPLE null-key rows stay stable (set signature)") {
    withTempDir("increx-multinull") { dir =>
      val path = dir.getAbsolutePath
      val docs = ((1L to 10L).map(i => (Some(i), s"t$i")) ++
        Seq((Option.empty[Long], "null one"), (Option.empty[Long], "null two")))
        .toDF("doc_id", "text")
      Sharding.exportShards(docs, "doc_id", nShards = 4, path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def nullDirFiles = fs.listStatus(new org.apache.hadoop.fs.Path(
          s"$path/shard=__HIVE_DEFAULT_PARTITION__"))
        .map(f => s"${f.getPath.getName}@${f.getModificationTime}").sorted.toSeq
      val before = nullDirFiles
      // identical snapshots with 2 null-key rows: the per-row-surrogate
      // design would cross-pair them and churn the default partition
      // forever; the multiset signature must see them as unchanged
      assert(Sharding.incrementalExportShards(docs, docs, "doc_id", 4, path) === Nil)
      assert(nullDirFiles === before, "default partition must not churn")
      // dropping one null row IS a change and rewrites the partition
      val oneLess = docs.filter($"doc_id".isNotNull || $"text" === "null one")
      assert(Sharding.incrementalExportShards(docs, oneLess, "doc_id", 4, path) === Nil)
      assert(spark.read.parquet(path).filter($"doc_id".isNull).count() === 1L)
    }
  }

  test("incrementalExportShards: an emptied shard's directory is removed") {
    withTempDir("increx-empty") { dir =>
      val path = dir.getAbsolutePath
      // two docs in one known shard, nothing else
      val pair = (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      Sharding.exportShards(pair, "doc_id", nShards = 4, path)
      val victimShard = Sharding.assignShards(Seq(7L).toDF("doc_id"), "doc_id", 4)
        .select("shard").as[Long].head()
      // new snapshot drops EVERY doc of that shard
      val survivors = pair.join(
        Sharding.assignShards(pair, "doc_id", 4).filter($"shard" === victimShard)
          .select($"doc_id"), Seq("doc_id"), "left_anti")
      Sharding.incrementalExportShards(pair, survivors, "doc_id", 4, path)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/shard=$victimShard")),
        "stale directory for fully-emptied shard must be deleted")
      val got = spark.read.parquet(path).select("doc_id").as[Long].collect().sorted
      assert(got === survivors.select("doc_id").as[Long].collect().sorted)
    }
  }

  test("zOrderKey: interleave matches hand-computed Morton codes") {
    // identity quantization: lo=0, hi=2^bits-1 makes bucket == value
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L), (7L, 7L))
      .toDF("x", "y")
    val got = df.select($"x", $"y",
        Sharding.zOrderKey($"x", $"y", 0L, 7L, 0L, 7L, bits = 3).as("z"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    def morton(x: Long, y: Long): Long = (0 until 3).map(i =>
      (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).reduce(_ | _)
    for (((x, y), z) <- got) assert(z === morton(x, y), s"($x,$y)")
    // out-of-range clamps to edge buckets, never wraps
    val clamped = Seq((-5L, 100L)).toDF("x", "y")
      .select(Sharding.zOrderKey($"x", $"y", 0L, 7L, 0L, 7L, bits = 3))
      .as[Long].head()
    assert(clamped === morton(0L, 7L))
    // FAR out of range: the clamp runs before the multiply, so an
    // epoch-nanos outlier or Long.MaxValue sentinel cannot overflow
    // (ANSI mode would kill the job; non-ANSI would wrap to the WRONG
    // edge) — it lands in the top bucket like any other high value
    val extreme = Seq((Long.MaxValue, Long.MinValue)).toDF("x", "y")
      .select(Sharding.zOrderKey($"x", $"y", 0L, 7L, 0L, 7L, bits = 3))
      .as[Long].head()
    assert(extreme === morton(7L, 0L))
    // guards
    intercept[IllegalArgumentException](Sharding.zOrderKey($"x", $"y", 0, 7, 0, 7, 0))
    intercept[IllegalArgumentException](Sharding.zOrderKey($"x", $"y", 0, 7, 0, 7, 32))
    intercept[IllegalArgumentException](
      Sharding.zOrderKey($"x", $"y", 0, Long.MaxValue - 1, 0, 7, 16))
  }

  test("exportZOrder + readBox: 2-D pruning skips ranges, result exact") {
    withTempDir("zorder") { dir =>
      // 64x64 grid: both dimensions uniformly covered, so a small box
      // must prune most ranges in EITHER dimension
      val rows = (0L until 4096L).map(i => (i, i % 64L, i / 64L))
        .toDF("id", "x", "y")
      val manifest = Sharding.exportZOrder(rows, "x", "y",
        xLo = 0L, xHi = 63L, yLo = 0L, yHi = 63L,
        nRanges = 16, path = dir.getAbsolutePath, bits = 6)
      val m = manifest.as[(Int, Long, Long, Long, Long, Long)].collect()
      assert(m.map(_._6).sum === 4096L, "manifest covers every row")
      // a tight box: exact result vs brute-force filter
      val box = Sharding.readBox(manifest, dir.getAbsolutePath, "x", "y",
        xLoQ = 10L, xHiQ = 13L, yLoQ = 20L, yHiQ = 23L)
      val expect = rows.filter($"x".between(10, 13) && $"y".between(20, 23))
        .select("id").as[Long].collect().sorted
      assert(box.select("id").as[Long].collect().sorted === expect)
      assert(expect.length === 16)
      // 2-D pruning: the box touches strictly fewer dirs than exist —
      // and pruning bites on BOTH dimensions (a y-only slab also prunes,
      // which a 1-D x-sorted layout could never do)
      def dirsOf(df: org.apache.spark.sql.DataFrame) = df.inputFiles
        .map(f => f.replaceAll("/[^/]*$", "").replaceAll(".*/", "")).distinct
      assert(dirsOf(box).length < 16, "tight box must not scan every range")
      val ySlab = Sharding.readBox(manifest, dir.getAbsolutePath, "x", "y",
        0L, 63L, 0L, 3L)
      assert(dirsOf(ySlab).length < 16, "y-slab must prune too (Z-order locality)")
      assert(ySlab.count() === 256L)
      // empty overlap: no rows, no crash
      assert(Sharding.readBox(manifest, dir.getAbsolutePath, "x", "y",
        100L, 200L, 100L, 200L).count() === 0L)
    }
  }

  test("readRange: prunes to overlapping range dirs only (inputFiles-proven)") {
    withTempDir("readrange") { dir =>
      val rows = (1L to 2000L).map(i => (i, i * 50L)).toDF("doc_id", "ts")
      val manifest = Sharding.exportSorted(rows, "ts", nRanges = 4, dir.getAbsolutePath)
      val bounds = manifest.as[(Int, Long, Long, Long)].collect().sortBy(_._2)
      // probe a window entirely inside the FIRST range
      val (lo, hi) = (bounds.head._2, (bounds.head._2 + bounds.head._3) / 2)
      val pruned = Sharding.readRange(manifest, dir.getAbsolutePath, "ts", lo, hi)
      val touchedDirs = pruned.inputFiles
        .map(f => f.replaceAll("/[^/]*$", "").replaceAll(".*/", "")).distinct.sorted
      assert(touchedDirs === Array(s"range_id=${bounds.head._1}"),
        s"expected only the first range dir, touched: ${touchedDirs.mkString(",")}")
      // values are exactly the full-scan filter's
      val expect = rows.filter($"ts" >= lo && $"ts" <= hi)
        .select("doc_id").as[Long].collect().sorted
      assert(pruned.select("doc_id").as[Long].collect().sorted === expect)
      // a window spanning two ranges touches exactly those two dirs
      val (lo2, hi2) = (bounds(1)._3, bounds(2)._2)
      val two = Sharding.readRange(manifest, dir.getAbsolutePath, "ts", lo2, hi2)
      val twoDirs = two.inputFiles
        .map(f => f.replaceAll("/[^/]*$", "").replaceAll(".*/", "")).distinct.sorted
      assert(twoDirs === Array(s"range_id=${bounds(1)._1}", s"range_id=${bounds(2)._1}").sorted)
      // an empty overlap returns empty without touching data
      val none = Sharding.readRange(manifest, dir.getAbsolutePath, "ts",
        Long.MaxValue - 10, Long.MaxValue)
      assert(none.count() === 0)
    }
  }

  test("exportSorted: empty input yields an empty manifest, not a crash") {
    withTempDir("sorted-empty") { dir =>
      val empty = Seq.empty[(Long, Long)].toDF("doc_id", "ts")
      val manifest = Sharding.exportSorted(empty, "ts", nRanges = 4, dir.getAbsolutePath)
      assert(manifest.count() === 0)
    }
  }

  test("exportShards writes one directory per shard and round-trips") {
    withTempDir("shards") { dir =>
      val docs = (1L to 200L).map(i => (i, s"doc $i text")).toDF("doc_id", "text")
      Sharding.exportShards(docs, "doc_id", 4, dir.getAbsolutePath)
      val shardDirs = dir.listFiles().filter(_.getName.startsWith("shard=")).map(_.getName).sorted
      assert(shardDirs === Array("shard=0", "shard=1", "shard=2", "shard=3"))
      val back = spark.read.parquet(dir.getAbsolutePath)
      assert(back.count() === 200)
      // partition-column shard values survive the round trip intact
      val reassigned = Sharding.assignShards(back.select(col("doc_id"), col("text")), "doc_id", 4)
      val mismatch = back.select(col("doc_id"), col("shard").cast("long").as("s1"))
        .join(reassigned.select(col("doc_id"), col("shard").as("s2")), "doc_id")
        .filter(col("s1") =!= col("s2")).count()
      assert(mismatch === 0)
    }
  }
}
