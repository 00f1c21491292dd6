package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashingEmbedder
import graft.operators.{ChunkStore, TextChunker, VectorSearch}

/** The complete reference lifecycle composed end-to-end (SURVEY §3.1 +
  * §3.2) as one driver-gate query: ingest (B4-B8, B11) then the
  * flagship read path (A1-A5, A7) against the just-built store. Not
  * SQL-expressible (chunker + hashing embedder) → rows-only; each stage
  * is oracle- or scalatest-verified individually.
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_reference_pipeline" -> { (s, dir) =>
      // §3.2 write path: load → chunk (500/100) → enrich → embed →
      // dual-write tag into target + master
      val docs = Tables.documents(s, dir)
      val chunks = TextChunker.chunkDocuments(docs)
        // unique per-chunk key so the top-k (dist, id) tie-break is a
        // total order (doc_id alone repeats across a doc's chunks)
        .withColumn("chunk_uid", col("doc_id") * 100000 + col("chunk_index"))
      val embedded = HashingEmbedder.withEmbedding(chunks, "content")
      val store = ChunkStore.dualWrite(embedded, "strategy_documents")

      // §3.1 read path: embed query driver-side, KNN top-k over the
      // master collection with metadata pre-filter, score threshold,
      // sort desc — the reference's /search_score composition
      val queryText = "spark table scan join merge"
      val qv = HashingEmbedder.embed(queryText).toSeq
      val topk = VectorSearch.topKWithScore(
        store.filter(col("collection") === "master"),
        qv, k = 10, VectorSearch.L2Sq,
        filter = Some(col("lang") =!= "zh"),
        embCol = "embedding", idCol = "chunk_uid")
      VectorSearch.scoreAndThreshold(topk, threshold = 0.1, idCol = "chunk_uid")
        .select(col("doc_id"), col("chunk_index"), col("score"))
        .orderBy(col("score").desc, col("doc_id"), col("chunk_index"))
    }
  )

  val oracle: Map[String, String] = Map.empty
}
