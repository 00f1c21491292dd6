package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Binary quantization (BQ) for the embedding column: one SIGN BIT per
  * component, packed 8-per-byte — the 1-bit extreme of the compression
  * family (PQ: 8-byte codebook codes; SQ8: d int8 bytes; BQ: d/8
  * bytes, 32× smaller than f32). The Qdrant/Weaviate "binary
  * quantization" and faiss `LSH`-with-rerank shape: production-grade
  * recall comes from an OVERSAMPLED candidate cut (rerank ≫ k) plus an
  * exact f32 rerank, exactly like the SQ8 two-phase contract
  * ([[Sq.searchSq8]]).
  *
  * Bit contract (shared kernel [[bqBit]], so corpus and query sides
  * cannot fork):
  *   bit_i = 1  iff  x_i is FINITE and x_i > 0, else 0.
  * The finiteness guard is load-bearing for engine parity: Scala's
  * `NaN > 0` is false while DuckDB ranks NaN above all numbers (its
  * `NaN > 0` is TRUE) — `isfinite(x) AND x > 0` evaluates identically
  * on both. Packing is LSB-first (dim i lives at byte i/8, bit i%8);
  * pad bits of a final partial byte are 0.
  *
  * Candidate ranking is ASYMMETRIC and integer-exact: the doc side is
  * its sign bits, the query side keeps its f32 components in 2^20
  * fixed point (the [[Ann.FpScale]] rule), and
  *   adot_fp = Σ_i (2·bit_i − 1) · floor(q_i · 2^20)
  * — the faiss asymmetric-distance idea. An exact integer sum is
  * engine- and order-portable (no float accumulation at the cut
  * boundary), and asymmetric scoring buys a large recall margin over
  * symmetric Hamming at the same rerank depth (measured on the
  * fixtures: recall@10 1.0 vs 0.9 at rerank=96). The symmetric
  * XOR-popcount [[hamming]] kernel is also provided — it is the
  * doc-vs-doc primitive (near-dup buckets, diversity) where no f32
  * side exists.
  *
  * Replay contract: like SQ8 — and unlike every codebook index — BQ
  * needs NO trained artifact and NO handoff: bits, fixed-point query,
  * integer dots, candidate cut and f32 rerank are all re-derivable in
  * SQL from `embeddings` alone. Appends quantize independently
  * (stateless per row), so there is no refit cycle to drift.
  *
  * Scale shape: the candidate scan reads ONLY the d/8-byte code column
  * (32× less IO than f32 — at 100 TB of f32 vectors the bit scan
  * touches ~3 TB) and keeps per-partition top-rerank heaps
  * (TakeOrderedAndProject, no shuffle); the exact rerank fetches the
  * f32 vectors of `rerank` ids via a pushed `isin`. Uniform-dimension
  * contract: the asymmetric kernel zips query dims against bit slots,
  * so a corpus whose dimension differs from the query's (flagged by
  * [[Maintenance.embeddingHealth]]) scores pad slots as sign-0; the
  * SQL replay assumes the uniform-d corpus every other ANN gate does. */
object Bq {

  /** The one bit rule — see the object scaladoc. */
  @inline private[operators] def bqBit(x: Float): Int =
    if (java.lang.Float.isFinite(x) && x > 0.0f) 1 else 0

  /** Pack a vector's sign bits LSB-first into ceil(d/8) bytes. */
  private[graft] def bqCodes(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte]((v.length + 7) / 8)
    var i = 0
    while (i < v.length) {
      if (bqBit(v(i)) == 1)
        out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Symmetric Hamming distance: popcount of XOR over the overlapping
    * bytes (pad bits are 0 on both sides, so they never disagree). */
  private[graft] def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var s = 0
    var i = 0
    while (i < n) {
      s += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    s
  }

  /** The query side of the asymmetric scorer: each component in 2^20
    * fixed point. Requires a finite query (floor(NaN·2^20) forks the
    * engines: Scala's NaN.toLong is 0, DuckDB's CAST errors) with
    * components small enough that the fixed-point value is exact in a
    * long — any health-gated embedding passes by ~40 orders of
    * magnitude. */
  private[graft] def qFixedPoint(q: Array[Float]): Array[Long] = {
    q.map { x =>
      require(java.lang.Float.isFinite(x),
        "BQ asymmetric scoring needs a finite query vector")
      val fp = math.floor(x.toDouble * Ann.FpScale.toDouble)
      require(math.abs(fp) < (1L << 40).toDouble,
        s"query component $x out of the fixed-point domain")
      fp.toLong
    }
  }

  /** Exact integer asymmetric dot: Σ (2·bit_i − 1)·qfp_i over the
    * query's dims; bit slots beyond the code's bytes read as 0
    * (sign −1), matching the uniform-d contract. |result| ≤ d·2^20·
    * max|q| — long-safe for any real dimension. */
  private[graft] def adotFp(code: Array[Byte], qfp: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < qfp.length) {
      val bit =
        if ((i >> 3) < code.length) (code(i >> 3) >> (i & 7)) & 1 else 0
      s += (2L * bit - 1L) * qfp(i)
      i += 1
    }
    s
  }

  /** Add the packed sign-bit column (`BinaryType`, ceil(d/8) bytes).
    * Null embeddings stay null. Stateless per row — quantize at ingest
    * and append forever, nothing to refit. */
  def quantize(df: DataFrame, embCol: String = "embedding",
               codeCol: String = "bq_code"): DataFrame = {
    val enc = udf { (v: Seq[Float]) =>
      if (v == null) null else bqCodes(v.toArray)
    }
    df.withColumn(codeCol, enc(col(embCol)))
  }

  /** Phase 1 as a lazy frame: (idCol, adot_fp), the `rerank` best
    * codes by exact asymmetric integer dot. Touches ONLY (id, code) —
    * the scan's ReadSchema excludes the f32 column (BqSpec pins it).
    * Null-id rows are excluded up front (an id-less candidate cannot
    * be fetched in phase 2 and would burn a rerank slot — the
    * [[Sq.sq8Candidates]] rule). */
  private[graft] def bqCandidates(quantized: DataFrame, queryVec: Seq[Float],
                                  rerank: Int, idCol: String = "vec_id",
                                  codeCol: String = "bq_code"): DataFrame = {
    val qfp = qFixedPoint(queryVec.toArray)
    val dotU = udf { (c: Array[Byte]) =>
      if (c == null) null else java.lang.Long.valueOf(adotFp(c, qfp))
    }
    quantized.select(col(idCol), col(codeCol))
      .filter(col(idCol).isNotNull)
      .withColumn("adot_fp", dotU(col(codeCol)))
      .filter(col("adot_fp").isNotNull)
      .orderBy(col("adot_fp").desc, col(idCol))
      .limit(rerank)
      .select(col(idCol), col("adot_fp"))
  }

  /** BQ ANN in the two-phase code-scan shape ([[Sq.searchSq8]]'s
    * contract, at 8× its compression):
    *
    *  1. CANDIDATE SCAN reads only (id, packed bits) — d/8+8 bytes per
    *     row — ranks by exact integer asymmetric dot in per-partition
    *     TakeOrdered heaps (no shuffle), and brings the bounded
    *     (id, adot_fp) list to the driver.
    *  2. FETCH + RERANK reads the f32 vectors of the `rerank` ids via
    *     a pushed `isin`, then exact f32 cosine top-k.
    *
    * 1-bit codes are coarse: size `rerank` as an OVERSAMPLE of k
    * (production BQ uses 4–10×; the gate uses 96 ≈ 10×k for its
    * measured recall margin). Returns (input columns minus emb/code)
    * + (adot_fp, cos_sim) in (cos_sim desc, id) order. */
  def searchBq(quantized: DataFrame, queryVec: Seq[Float], k: Int,
               rerank: Int, embCol: String = "embedding",
               idCol: String = "vec_id",
               codeCol: String = "bq_code"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val cand = bqCandidates(quantized, queryVec, rerank, idCol, codeCol)
      .collect()
    Sq.fetchAndRerank(quantized, cand, "adot_fp", queryVec, k,
      embCol, idCol, codeCol)
  }

  /** IVF + BQ — the combined at-scale shape (faiss `IVF<n>,` + a
    * binary quantizer, Milvus `BIN_IVF`): coarse cluster pruning cuts
    * the scan to ~nprobe/k of the corpus, the 1-bit asymmetric
    * integer dot ranks the survivors on 32×-compressed codes, and the
    * f32 rerank restores exact order — [[Sq.searchIvfSq8]]'s contract
    * at the compression family's far end. Probe ranking is the ONE
    * shared [[Ann.rankProbes]] kernel; quantization runs in-plan over
    * the pruned rows (a production table stores `bq_code` next to
    * `ivf_cluster` at ingest — [[quantize]] is stateless, appends
    * never refit). */
  def searchIvfBq(index: Ann.IvfIndex, queryVec: Seq[Float], k: Int,
                  rerank: Int, nprobe: Int): DataFrame = {
    val probes = Ann.rankProbes(index.centroids, queryVec.toArray, nprobe)
    val pruned = index.assigned.filter(col("ivf_cluster").isin(probes: _*))
    searchBq(quantize(pruned, index.embCol), queryVec, k, rerank,
      index.embCol, index.idCol)
  }
}
