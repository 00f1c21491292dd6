package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star scope, BASELINE.md): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extract / resize / frame-sample as
  * batched per-partition functions.
  *
  * The decode kernels themselves are STUBS (this container has no
  * image/audio codecs — marked below); everything Spark-side is real:
  * the schema, the mapPartitions batch shape (amortize per-partition
  * model/codec init, exactly how an ONNX/ffmpeg impl slots in), and the
  * partitioning story (media rows are large → size partitions by bytes
  * via `spark.sql.files.maxPartitionBytes`, never groupBy raw binary).
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Deterministic synthetic media table derived from a text corpus —
    * the fixture stand-in for binary payloads. */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    // pmod: negative ids under % would hit index 0 (error) or wrap to a
    // wrong element via element_at's from-the-end negative indexing
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col(idCol), lit(3)) + 1).cast("int"))
    docs.select(
      col(idCol).as("media_id"),
      kind.as("kind"),
      col(textCol).cast("binary").as("bytes"),
      struct(
        lit("synthetic").as("format"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        (length(col(textCol)) * 10L).as("duration_ms")).as("meta"))
  }

  /** STUB decode: a real implementation decodes the payload with an
    * image/audio codec inside this same mapPartitions loop (init codec
    * once per partition, stream rows through). The deterministic fake
    * derives a feature vector from the bytes so the pipeline shape —
    * binary in, fixed-width float features out, batched — is fully
    * exercised and testable. */
  def decodeFeaturesStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var h = 0x811c9dc5
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xff; h *= 0x01000193
      v(math.floorMod(h, dim)) += (if ((h & 0x80000000) == 0) 1.0f else -1.0f)
      i += 1
    }
    var norm = 0.0
    i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) { val inv = (1.0 / math.sqrt(norm)).toFloat; i = 0; while (i < dim) { v(i) *= inv; i += 1 } }
    v
  }

  /** Feature extraction over media rows: mapPartitions so per-partition
    * codec/model init happens once (the stub's "init" is trivial; an
    * ONNX session or ffmpeg context goes exactly here). Output keeps
    * (media_id, kind) and appends `features`. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val bytesIdx = media.schema.fieldIndex("bytes")
    val rdd = media.rdd.mapPartitions { rows =>
      // per-partition init goes here (codec/model session)
      rows.map { r =>
        Row(r.getLong(idIdx), r.getString(kindIdx),
          decodeFeaturesStub(r.getAs[Array[Byte]](bytesIdx), dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize: metadata-level resize (real impl: decode → scale →
    * re-encode in the same partition loop). Clamps dimensions, keeps
    * payload untouched. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      least(col("meta.width"), lit(maxW)).as("width"),
      least(col("meta.height"), lit(maxH)).as("height"),
      col("meta.duration_ms").as("duration_ms")))

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp (every `everyMs` ms of duration) — posexplode of a
    * generated timestamp sequence; non-video rows pass through with a
    * single frame at t=0. A real impl decodes the frame bytes at each
    * timestamp inside a mapPartitions loop. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame = {
    // coalesce: a video row with null duration still yields one frame at
    // t=0 (a bare when/explode would silently drop the row)
    val dur = coalesce(col("meta.duration_ms"), lit(1L))
    val ts = when(col("kind") === "video",
      sequence(lit(0L), greatest(dur - 1, lit(0L)), lit(everyMs)))
      .otherwise(array(lit(0L)))
    media
      .withColumn("frame_ts", explode(ts))
      .select(col("media_id"), col("kind"), col("frame_ts"))
  }
}
