package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** The engine's embedding contract (SURVEY §2.B8): deterministic
  * `text → L2-normalized float[dim]`. Lightweight implementations are
  * serializable and can be passed directly; heavyweight backends (an
  * ONNX/torch session) are constructed per-partition via the
  * `() => Embedder` factory form of [[Embedders.embedDistributed]] —
  * the session is created once per partition, never serialized. */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  /** batch hook — override when the backend benefits from batching
    * (model inference); default delegates per-row. */
  def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] =
    texts.map(embed)
}

/** Distributed embedding drivers over any [[Embedder]]. */
object Embedders {

  /** Append `embedding` via mapPartitions: `mkEmbedder` runs ONCE per
    * partition (the place to open an ONNX session / load weights), then
    * rows flow through [[Embedder.embedBatch]] in `batchSize` groups —
    * backends that override the batch hook get real batched inference. */
  def embedDistributed(df: DataFrame, textCol: String,
                       mkEmbedder: () => Embedder,
                       batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val textIdx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false))
    val rdd = df.rdd.mapPartitions { rows =>
      val embedder = mkEmbedder() // per-partition init (model/session)
      rows.grouped(batchSize).flatMap { group =>
        val vecs = embedder.embedBatch(group.iterator.map(_.getString(textIdx))).toSeq
        group.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Serializable-instance convenience form. */
  def embedDistributed(df: DataFrame, textCol: String,
                       embedder: Embedder): DataFrame =
    embedDistributed(df, textCol, () => embedder)
}

/** B8 (SURVEY §2): embedding inference re-expressed as a pluggable,
  * deterministic, model-free embedder.
  *
  * The reference embeds via a HuggingFace model singleton
  * (`embedding.py:7-27`, `intfloat/multilingual-e5-large-instruct`,
  * L2-normalized 1024-dim output per `config.py:35-43`). Model inference
  * is not a Spark-native operation; the engine treats embeddings as DATA
  * (a column). This hashing embedder reproduces the *contract* — a
  * deterministic `text → L2-normalized float[dim]` map — so the whole
  * ingest→search pipeline is self-contained and testable. A real model
  * slots in behind the same signature via `mapPartitions` (per-partition
  * ONNX session init) without touching any other operator.
  *
  * Scheme: character 3-gram hashing-trick projection (HashingTF-style):
  * each n-gram increments `sign * 1.0` at bucket `hash(ngram) % dim`,
  * sign from a second hash bit; the vector is then L2-normalized. Similar
  * texts share n-grams → close vectors; disjoint texts are near-orthogonal.
  */
object HashingEmbedder {

  val DefaultDim = 64 // matches the fixture embedding dim (FIXTURES.md)

  /** [[Embedder]] instance backed by the hashing projection. */
  def asEmbedder(d: Int = DefaultDim): Embedder = new Embedder {
    val dim: Int = d
    def embed(text: String): Array[Float] = HashingEmbedder.embed(text, d)
  }

  /** Deterministic (seed-free) string hash — FNV-1a 32-bit, stable across
    * JVMs (String.hashCode is also stable, but FNV gives better mixing). */
  private def fnv1a(s: CharSequence): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x01000193; i += 1 }
    h
  }

  /** Embed one text. Pure function — usable driver-side for query
    * embedding (the reference embeds queries driver-side too, `app.py:402`). */
  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null && text.length >= 3) {
      var i = 0
      val n = text.length - 2
      while (i < n) {
        val h = fnv1a(text.subSequence(i, i + 3))
        val bucket = math.floorMod(h, dim)
        val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
        v(bucket) += sign
        i += 1
      }
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** Column form for distributed embedding of a text column. */
  def embedColumn(text: Column, dim: Int = DefaultDim): Column = {
    val u = udf((s: String) => embed(s, dim))
    u(text)
  }

  /** Convenience: add an `embedding` column to a chunk corpus. */
  def withEmbedding(df: DataFrame, textCol: String = "content",
                    dim: Int = DefaultDim): DataFrame =
    df.withColumn("embedding", embedColumn(col(textCol), dim))
}
