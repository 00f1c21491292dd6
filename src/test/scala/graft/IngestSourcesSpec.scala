package graft

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.ZipIngest

/** B1-B3 zip/binary ingest + multimodal plumbing spec. */
class IngestSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def makeZip(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    for ((name, text) <- entries) {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(text.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("explodeZip: members round-trip, directories skipped") {
    val z = makeZip("a.txt" -> "hello", "dir/b.txt" -> "world")
    val members = ZipIngest.explodeZip(z)
    assert(members.map(_._1) === Seq("a.txt", "dir/b.txt"))
    assert(members.map(m => new String(m._2, "UTF-8")) === Seq("hello", "world"))
  }

  test("decodeZipName: UTF-8 names survive, NFC applied") {
    // java ZipOutputStream writes UTF-8 names; reading as CP437 gives the
    // raw bytes back, and the decode chain must recover the original
    val korean = "한국어문서.txt"
    val raw = new String(korean.getBytes("UTF-8"), java.nio.charset.Charset.forName("CP437"))
    assert(ZipIngest.decodeZipName(raw) === korean)
    // NFD input normalizes to NFC
    val nfd = java.text.Normalizer.normalize("café.txt", java.text.Normalizer.Form.NFD)
    val rawNfd = new String(nfd.getBytes("UTF-8"), java.nio.charset.Charset.forName("CP437"))
    assert(ZipIngest.decodeZipName(rawNfd) === "café.txt")
  }

  test("parseDocument: dispatch + unsupported-type error (B1 semantics)") {
    assert(ZipIngest.parseDocument("a.txt", "hi".getBytes("UTF-8")) === Right("hi"))
    assert(ZipIngest.parseDocument("a.TXT", "hi".getBytes("UTF-8")) === Right("hi"))
    assert(ZipIngest.parseDocument("a.docx", Array[Byte]()).isLeft)
    assert(ZipIngest.parseDocument("noext", Array[Byte]()).isLeft)
  }

  test("ingestZips + uploadStatus: per-member parse, per-zip lattice") {
    val good = makeZip("a.txt" -> "alpha", "b.txt" -> "beta")
    val mixed = makeZip("c.txt" -> "gamma", "d.exe" -> "binary")
    val corrupt = "this is not a zip".getBytes("UTF-8")
    val bin = Seq(("z1.zip", good), ("z2.zip", mixed), ("z3.zip", corrupt))
      .toDF("path", "content")
    val ingested = ZipIngest.ingestZips(bin).cache()
    try {
      assert(ingested.count() === 4)
      assert(ingested.filter($"ok").count() === 3)
      val status = ZipIngest.uploadStatus(ingested, Some(bin))
        .select("zip_path", "status").as[(String, String)].collect().toMap
      assert(status("z1.zip") === "success")
      assert(status("z2.zip") === "partial_success")
      // a corrupt archive explodes to zero members but must still report
      assert(status("z3.zip") === "error")
    } finally ingested.unpersist()
  }

  test("decodeZipName: EFS names with CP437-encodable accents survive") {
    // "café.txt" re-encodes to CP437 cleanly (é exists there) but is
    // neither valid UTF-8 nor valid EUC-KR as bytes -> keep original
    assert(ZipIngest.decodeZipName("café.txt") === "café.txt")
  }

  test("initializeStore: empty store is readable with full schema, idempotent") {
    import graft.operators.ChunkStore
    val dir = java.nio.file.Files.createTempDirectory("init-store").toString + "/store"
    ChunkStore.initializeStore(spark, dir, graft.ChunkSchema.schema,
      graft.ChunkSchema.collections)
    val read = spark.read.parquet(dir)
    assert(read.count() === 0)
    assert(read.schema.fieldNames.contains("collection"))
    assert(read.schema.fieldNames.contains("embedding"))
    ChunkStore.initializeStore(spark, dir, graft.ChunkSchema.schema) // no-op
    assert(spark.read.parquet(dir).count() === 0)
  }

  test("explode_zip Generator: SQL-callable zip explode with name decode") {
    graft.Graft.init(spark)
    val z = makeZip("a.txt" -> "hello", "한국어.txt" -> "세계")
    Seq(("z.zip", z)).toDF("path", "content").createOrReplaceTempView("zips_sql")
    val rows = spark.sql(
      """SELECT path, m.member_name, m.member_bytes
        |FROM zips_sql LATERAL VIEW explode_zip(content) m AS member_name, member_bytes
        |ORDER BY member_name""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(1)).toSeq === Seq("a.txt", "한국어.txt"))
    assert(new String(rows(1).getAs[Array[Byte]](2), "UTF-8") === "세계")
  }

  test("writeRawObjects (B12): byte-exact round trip, partitioned by collection") {
    val z = makeZip("a.txt" -> "hello", "한국어.txt" -> "세계")
    val members = ZipIngest.explodeZips(
      Seq(("mem://z.zip", z)).toDF("path", "content"))
    val dir = java.nio.file.Files.createTempDirectory("raw-objects").toString
    ZipIngest.writeRawObjects(members, dir, "strategy_documents")
    val back = spark.read.parquet(dir)
    assert(back.select("collection").distinct().as[String].collect().toSeq ===
      Seq("strategy_documents"))
    val bytes = back.orderBy($"member_name")
      .select($"member_name", $"member_bytes").as[(String, Array[Byte])].collect()
    assert(bytes.map(_._1).toSeq === Seq("a.txt", "한국어.txt"))
    assert(new String(bytes(1)._2, "UTF-8") === "세계")
  }

  test("multimodal: feature extraction is deterministic and normalized") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sfDir).limit(30))
    def run() = Multimodal.extractFeatures(media, 64).orderBy($"media_id")
      .select($"kind", $"features").as[(String, Seq[Double])].collect()
    val f1 = run(); val f2 = run()
    assert(f1.toSeq === f2.toSeq)
    // stub kinds are L2-normalized; image histograms are L1 (shares sum to 1)
    assert(f1.collect { case (k, v) if k != "image" => v }
      .forall(v => math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-5))
    assert(f1.collect { case ("image", v) => v }
      .forall(v => math.abs(v.sum - 1.0) < 1e-9))
  }

  test("multimodal: PNG round-trip — decode(encode(gen)) reproduces the raster") {
    for (id <- Seq(0L, 3L, 12L, 999L)) {
      val (w, h) = (8 + (id % 5).toInt, 8 + (id % 3).toInt)
      val px = Array.tabulate(w * h)(i => Multimodal.synthPixel(id, i % w, i / w))
      val (dw, dh, dpx) = Multimodal.decodeGray(Multimodal.encodePng(w, h, px))
      assert((dw, dh) === ((w, h)))
      assert(dpx.toSeq === px.toSeq)
    }
    // syntheticMedia image rows carry real decodable PNGs with truthful meta
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sfDir).limit(30))
      .filter($"kind" === "image")
      .select($"media_id", $"bytes", $"meta.width", $"meta.height")
      .as[(Long, Array[Byte], Int, Int)].collect()
    assert(media.nonEmpty)
    for ((id, bytes, mw, mh) <- media) {
      val (dw, dh, dpx) = Multimodal.decodeGray(bytes)
      assert((dw, dh) === ((mw, mh)), s"media $id meta dims")
      assert(dpx.zipWithIndex.forall { case (p, i) =>
        p == Multimodal.synthPixel(id, i % dw, i / dw) }, s"media $id pixels")
    }
  }

  test("multimodal: WAV round-trip — decode(encode(gen)) reproduces the samples") {
    // negative id included: the floored-mod generator must stay in
    // PCM16 range and round-trip for it too
    for (id <- Seq(0L, 1L, 7L, 999L, -4L)) {
      val n = 400 + math.floorMod(id, 7L).toInt * 100
      val smp = Array.tabulate(n)(i => Multimodal.synthSample(id, i))
      assert(smp.forall(s => s >= -32768 && s <= 32767), s"id $id range")
      val wav = Multimodal.encodeWavPcm16(smp)
      assert(Multimodal.isRiff(wav))
      val (rate, ch, dec) = Multimodal.decodeWavPcm16(wav)
      assert(rate === Multimodal.AudioSampleRate)
      assert(ch === 1)
      assert(dec.toSeq === smp.toSeq, s"id $id samples")
    }
    // syntheticAudio rows decode through the real codec, formula-exact
    val audio = Multimodal.syntheticAudio(Tables.documents(spark, sfDir).limit(9))
      .select($"media_id", $"bytes").as[(Long, Array[Byte])].collect()
    assert(audio.nonEmpty)
    for ((id, bytes) <- audio) {
      val (_, _, dec) = Multimodal.decodeWavPcm16(bytes)
      assert(dec.zipWithIndex.forall { case (s, i) =>
        s == Multimodal.synthSample(id, i) }, s"media $id samples")
    }
  }

  test("multimodal: extractFeatures routes RIFF audio to the real decoder") {
    val audio = Multimodal.syntheticAudio(Tables.documents(spark, sfDir).limit(6))
      .withColumn("kind", lit("audio"))
    val feats = Multimodal.extractFeatures(audio, 64).orderBy($"media_id")
      .select($"media_id", $"features").as[(Long, Seq[Double])].collect()
    assert(feats.nonEmpty)
    for ((id, v) <- feats) {
      // real amplitude histogram: L1 (shares sum to 1), matches the
      // direct kernel — a stub fallback would be L2-normalized instead
      assert(math.abs(v.sum - 1.0) < 1e-9, s"media $id not a histogram")
      val wav = Multimodal.encodeWavPcm16(
        Array.tabulate(400 + math.floorMod(id, 7L).toInt * 100)(
          i => Multimodal.synthSample(id, i)))
      assert(v === Multimodal.audioHistogramFeatures(wav, 64).toSeq)
    }
    // non-RIFF audio payloads still fall back to the stub (L2-normed)
    val stub = Multimodal.syntheticMedia(Tables.documents(spark, sfDir).limit(30))
      .filter($"kind" === "audio")
    val sf = Multimodal.extractFeatures(stub, 64)
      .select($"features").as[Seq[Double]].collect()
    assert(sf.nonEmpty)
    assert(sf.forall(v => math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-5))
  }

  test("multimodal: frame sampling emits one row per second of video") {
    val media = Multimodal.syntheticMedia(Tables.documents(spark, sfDir).limit(30))
    val frames = Multimodal.sampleFrames(media, 1000L)
    val video = media.filter($"kind" === "video")
      .select($"media_id", $"meta.duration_ms").as[(Long, Long)].collect()
    val counts = frames.filter($"kind" === "video")
      .groupBy($"media_id").count().as[(Long, Long)].collect().toMap
    for ((id, dur) <- video)
      assert(counts(id) === (dur + 999) / 1000, s"media $id dur $dur")
    // non-video: exactly one frame at t=0
    val nonVideo = frames.filter($"kind" =!= "video")
    assert(nonVideo.groupBy($"media_id").count().filter($"count" =!= 1).isEmpty)
    assert(nonVideo.filter($"frame_ts" =!= 0).isEmpty)
  }
}
