package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Scalar quantization (SQ8) for the embedding column: each vector is
  * L2-normalized and its components mapped to int8 — 4× smaller than
  * f32, and candidate ranking becomes an EXACT int64 dot product
  * (integer arithmetic is engine- and order-portable, the repo's
  * fixed-point rule). The faiss `SQ8` / Lucene `int8` idea, completing
  * the compression family next to PQ (8-byte codes, codebook lookup)
  * and the JL projection (d'=16 floats): SQ8 keeps full
  * dimensionality, needs NO trained codebook (every vector quantizes
  * independently — append-friendly by construction, no drift-refit
  * cycle), and reranks exactly.
  *
  * Quantization contract (shared kernel [[sq8Codes]], used by the
  * corpus UDF and the query side so the two cannot fork):
  *   norm  = f32 sqrt of the f32 sum of squares — exactly the
  *           EuclideanDistF32 kernel against the zero vector, hence
  *           DuckDB `list_distance(e, zeros)` bit-parity;
  *   code_i = clamp(floor(x_i/norm · 127 + 0.5), −127, 127), computed
  *           in IEEE doubles on exact f32 inputs — engine-identical;
  *           the clamp covers the 1-ulp case where f32 norm rounds
  *           below a dominant |x_i| and the ratio exceeds 1;
  *   zero vector → all-zero codes (no NaN ever enters the column).
  *
  * Every stage — the codes, the int dot, the top-R candidate cut, the
  * f32 exact rerank — is replayable in SQL from `embeddings` alone: no
  * handoff artifact at all, the only ANN variant with that property.
  *
  * Scale shape: the candidate scan reads ONLY the d-byte code column
  * (parquet column pruning; 4× less IO than f32, 16× less than a
  * doubled corpus) and keeps per-partition top-R heaps
  * (TakeOrderedAndProject — no shuffle, k rows per task to the
  * driver); the exact rerank touches R rows' f32 vectors. */
object Sq {

  /** Shared int8 quantization kernel — see the object scaladoc for the
    * exact arithmetic contract. A vector whose norm is not finite and
    * positive (zero vector; NaN/Inf components; finite components
    * whose f32 sum of squares overflows) quantizes to ALL-ZERO codes
    * on BOTH engines — without the guard, Scala's NaN.toByte (0) and
    * SQL's LEAST(127, NaN) (NaN ranks above all numbers in DuckDB →
    * 127) would silently fork the replay on exactly the rows
    * [[graft.operators.Maintenance.embeddingHealth]] exists to flag. */
  private[graft] def sq8Codes(v: Array[Float]): Array[Byte] = {
    var acc = 0.0f
    var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(acc.toDouble).toFloat
    val out = new Array[Byte](v.length)
    if (nrm != 0.0f && java.lang.Float.isFinite(nrm)) {
      i = 0
      while (i < v.length) {
        val q = math.floor(v(i).toDouble / nrm.toDouble * 127.0 + 0.5)
        out(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
    }
    out
  }

  /** Exact int64 dot product of two code vectors (≤ d·127² ≈ 2²⁴·d —
    * nowhere near overflow at any real dimension). */
  private[graft] def dot8(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }

  /** Add the int8 code column (`BinaryType`, d bytes/row). Null
    * embeddings stay null. Stateless per row — quantize once at
    * ingest and append forever, no fit to drift from. */
  def quantize(df: DataFrame, embCol: String = "embedding",
               codeCol: String = "sq_code"): DataFrame = {
    val enc = udf { (v: Seq[Float]) =>
      if (v == null) null else sq8Codes(v.toArray)
    }
    df.withColumn(codeCol, enc(col(embCol)))
  }

  /** Phase 1 as a lazy frame: (idCol, approx_dot), the `rerank` best
    * codes by exact int dot. Touches ONLY (id, code) — PlanSpec pins
    * that the scan's ReadSchema excludes the embedding column.
    * Null-id rows are excluded up front: an id-less row cannot be
    * fetched in phase 2 (isin/join never match NULL), so ranking it
    * would silently burn a rerank slot. */
  private[graft] def sq8Candidates(quantized: DataFrame, queryVec: Seq[Float],
                                   rerank: Int, idCol: String = "vec_id",
                                   codeCol: String = "sq_code"): DataFrame = {
    val qc = sq8Codes(queryVec.toArray)
    val dotU = udf { (c: Array[Byte]) =>
      if (c == null) null else java.lang.Long.valueOf(dot8(c, qc))
    }
    quantized.select(col(idCol), col(codeCol))
      .filter(col(idCol).isNotNull)
      .withColumn("approx_dot", dotU(col(codeCol)))
      .filter(col("approx_dot").isNotNull)
      .orderBy(col("approx_dot").desc, col(idCol))
      .limit(rerank)
      .select(col(idCol), col("approx_dot"))
  }

  /** Shared PHASE 2 of the two-phase code-scan contract ([[searchSq8]]
    * and [[Bq.searchBq]] — one owner, so the fetch/rerank shape cannot
    * fork between the quantization families): materialize the bounded
    * candidate (id, dot) list on the driver, re-read the candidates'
    * f32 vectors via a pushed `isin` predicate, broadcast the dots
    * back alongside, exact f32 cosine top-k. Returns (input columns
    * minus emb/code) + (dotCol, cos_sim) in (cos_sim desc, id)
    * order. */
  private[operators] def fetchAndRerank(quantized: DataFrame,
                                        cand: Array[org.apache.spark.sql.Row],
                                        dotCol: String, queryVec: Seq[Float],
                                        k: Int, embCol: String,
                                        idCol: String,
                                        codeCol: String): DataFrame = {
    val spark = quantized.sparkSession
    import scala.jdk.CollectionConverters._
    val dots = spark.createDataFrame(
      cand.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol,
          quantized.schema(idCol).dataType, nullable = false),
        org.apache.spark.sql.types.StructField(dotCol,
          org.apache.spark.sql.types.LongType, nullable = false))))
    val ids = cand.map(_.get(0))
    quantized
      .filter(col(idCol).isin(ids: _*))
      .join(broadcast(dots), Seq(idCol))
      .withColumn("cos_sim",
        cosSimF32(col(embCol), typedLit(queryVec)).cast("double"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .drop(embCol, codeCol)
  }

  /** SQ8 ANN in TWO PHASES, like every production code-scan index:
    *
    *  1. CANDIDATE SCAN reads ONLY (id, code) — a narrow projection
    *     the parquet reader prunes to ~d+8 bytes/row (4× less than
    *     f32, 5× less than dragging the embedding through) — computes
    *     exact int dots and keeps `rerank` candidates in
    *     per-partition TakeOrdered heaps (no shuffle). The bounded
    *     candidate list (ids + dots) comes to the driver — `rerank`
    *     rows, the same bounded-collect contract as the IVF probe
    *     ranking.
    *  2. FETCH + RERANK reads the f32 vectors of the `rerank` ids
    *     only, via an `isin` predicate the scan pushes to parquet
    *     row-group stats (on an id-sorted/z-ordered corpus that is a
    *     handful of row groups, not a second full scan), then exact
    *     f32 cosine top-k.
    *
    * The price is one driver round-trip between the phases — exactly
    * the candidate-then-fetch shape of the PQ path's ADC rerank.
    * Returns (all input columns minus emb/code) + (approx_dot,
    * cos_sim) in (cos_sim desc, id) order. */
  def searchSq8(quantized: DataFrame, queryVec: Seq[Float], k: Int,
                rerank: Int, embCol: String = "embedding",
                idCol: String = "vec_id",
                codeCol: String = "sq_code"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val cand = sq8Candidates(quantized, queryVec, rerank, idCol, codeCol)
      .collect()
    fetchAndRerank(quantized, cand, "approx_dot", queryVec, k,
      embCol, idCol, codeCol)
  }

  /** IVF + SQ8 — the combined at-scale shape (faiss `IVF<n>,SQ8`):
    * coarse cluster pruning cuts the scan to ~nprobe/k of the corpus,
    * the int8 dot ranks the survivors on 4×-compressed codes, and the
    * f32 rerank restores exact order for the final k. Quantization
    * here runs in-plan over the PRUNED rows (bounded, and exactly what
    * the SQL oracle replays); a production table stores `sq_code`
    * next to `ivf_cluster` at ingest ([[quantize]] is stateless, so
    * appends quantize independently — no codebook refit ever) and the
    * scan then reads d bytes/row instead of 4d.
    *
    * Probe ranking is the exact [[Ann.searchIvf]] contract
    * ([[Ann.rankProbes]] — shared, cannot fork). */
  def searchIvfSq8(index: Ann.IvfIndex, queryVec: Seq[Float], k: Int,
                   rerank: Int, nprobe: Int): DataFrame = {
    val probes = Ann.rankProbes(index.centroids, queryVec.toArray, nprobe)
    val pruned = index.assigned.filter(col("ivf_cluster").isin(probes: _*))
    searchSq8(quantize(pruned, index.embCol), queryVec, k, rerank,
      index.embCol, index.idCol)
  }
}
