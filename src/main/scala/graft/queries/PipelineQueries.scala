package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashingEmbedder
import graft.operators.{ChunkStore, TextChunker, VectorSearch}

/** The complete reference lifecycle composed end-to-end (SURVEY §3.1 +
  * §3.2) as one driver-gate query: ingest (B4-B8, B11) then the
  * flagship read path (A1-A5, A7) against the just-built store.
  *
  * HASH-GATED via the verify-THROUGH handoff pattern: the write path
  * (chunker + hashing embedder — not SQL-expressible) publishes the
  * embedded dual-written store plus the driver-embedded query vector
  * as parquet handoffs, and the DuckDB oracle independently replays
  * the ENTIRE read path against them — collection + metadata
  * where-filter, `list_distance` L2 (bit-parity with the f32 kernel),
  * (dist, chunk_uid) top-k, score = 1 − dist² (within f64 rounding of
  * the reference's 1 − l2sq, `app.py:417-418` — dist is the f32
  * Euclidean, so squaring it back reconstructs l2sq up to one f32
  * sqrt round-trip; engine and oracle compute the IDENTICAL
  * expression, so the gate itself is exact), threshold 0.1
  * (`config.py:49`), sort desc. Every stage was already individually
  * oracle-gated; this hashes the flagship COMPOSITION itself
  * (`app.py:373-432`).
  */
object PipelineQueries {

  private val StoreHandoff = Handoff.path("e2e_store")
  private val QvecHandoff  = Handoff.path("e2e_qvec")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2e_reference_pipeline" -> { (s, dir) =>
      import s.implicits._
      // §3.2 write path: load → chunk (500/100) → enrich → embed →
      // dual-write tag into target + master
      val docs = Tables.documents(s, dir)
      val chunks = TextChunker.chunkDocuments(docs)
        // unique per-chunk key so the top-k (dist, id) tie-break is a
        // total order (doc_id alone repeats across a doc's chunks)
        .withColumn("chunk_uid", col("doc_id") * 100000 + col("chunk_index"))
      val embedded = HashingEmbedder.withEmbedding(chunks, "content")
      val store = Handoff.publish(
        ChunkStore.dualWrite(embedded, "strategy_documents")
          .select(col("chunk_uid"), col("doc_id"), col("chunk_index"),
            col("lang"), col("collection"), col("embedding")),
        StoreHandoff)

      // §3.1 read path: embed query driver-side, KNN top-k over the
      // master collection with metadata pre-filter, score threshold,
      // sort desc — the reference's /search_score composition. The
      // Euclidean kernel + dist² reconstructs the reference's l2sq
      // score within f64 rounding (one f32 sqrt round-trip) through
      // the one metric DuckDB replays bit-for-bit (list_distance —
      // the a3_score_threshold recipe); near-boundary values could in
      // principle land on the other side of the 0.1 threshold than a
      // direct-l2sq engine, but engine and oracle stay exact twins.
      val queryText = "spark table scan join merge"
      val qv = HashingEmbedder.embed(queryText).toSeq
      Handoff.publish(Seq(qv).toDF("embedding"), QvecHandoff)
      val topk = VectorSearch.topKWithScore(
        store.filter(col("collection") === "master"),
        qv, k = 10, VectorSearch.Euclidean,
        filter = Some(col("lang") =!= "zh"),
        embCol = "embedding", idCol = "chunk_uid")
      topk
        .withColumn("score", lit(1.0) - col("dist") * col("dist"))
        .filter(col("score") >= 0.1)
        .select(col("doc_id"), col("chunk_index"), col("score"))
        .orderBy(col("score").desc, col("doc_id"), col("chunk_index"))
    }
  )

  val oracle: Map[String, String] = Map(
    "e2e_reference_pipeline" ->
      s"""WITH st AS (SELECT * FROM read_parquet('$StoreHandoff/*.parquet')),
         |q AS (SELECT embedding AS qv FROM read_parquet('$QvecHandoff/*.parquet')),
         |topk AS (
         |  SELECT st.doc_id, st.chunk_index, st.chunk_uid,
         |         CAST(list_distance(st.embedding, q.qv) AS DOUBLE) AS dist
         |  FROM st CROSS JOIN q
         |  WHERE st.collection = 'master' AND st.lang <> 'zh'
         |  ORDER BY dist, st.chunk_uid LIMIT 10
         |)
         |SELECT doc_id, chunk_index, 1.0 - dist * dist AS score
         |FROM topk WHERE 1.0 - dist * dist >= 0.1
         |ORDER BY score DESC, doc_id, chunk_index""".stripMargin
  )
}
