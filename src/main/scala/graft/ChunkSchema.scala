package graft

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical chunk-corpus model (SURVEY §1.4): ChromaDB's six
  * persist directories collapse to ONE table partitioned by
  * `collection`, metadata dict becomes promoted columns + a
  * scalar-only spillover map, embeddings are a float array column.
  */
object ChunkSchema {

  /** Typed row for `Dataset[Chunk]` API surfaces. */
  final case class Chunk(
      chunk_id: String,
      doc_id: String,
      doc_name: String,
      chunk_index: Int,
      collection: String,
      original_collection: String,
      source: Option[String],
      content: String,
      metadata: Map[String, String],
      embedding: Array[Float])

  implicit val chunkEncoder: Encoder[Chunk] = Encoders.product[Chunk]

  /** DataFrame-side schema (field-for-field the §1.4 layout). */
  val schema: StructType = StructType(Seq(
    StructField("chunk_id", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = false),
    StructField("doc_name", StringType, nullable = false),
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("collection", StringType, nullable = false),
    StructField("original_collection", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("content", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** The six reference collections (`config.py:16-28`). */
  val collections: Seq[String] = Seq("master", "strategy_documents",
    "compliance_documents", "operation_documents", "it_security_documents",
    "organization_documents")

  /** B7: scalar-only metadata enforcement (`filter_complex_metadata`,
    * `document_processor.py:154-163`) — with metadata typed as
    * map<string,string> the non-scalar case is structurally impossible;
    * what remains is dropping null/blank-keyed entries, the runtime
    * residue of the reference's filter. */
  def sanitizeMetadata(df: DataFrame, metaCol: String = "metadata"): DataFrame =
    df.withColumn(metaCol,
      map_filter(col(metaCol), (k, v) => k.isNotNull && k =!= "" && v.isNotNull))
}
