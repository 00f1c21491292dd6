package graft.functions

import java.util.concurrent.atomic.AtomicInteger

/** A real batched neural text encoder behind the [[Embedder]] seam
  * (SURVEY §2.B8) — the stand-in for the reference's transformer model
  * (`embedding.py:7-27`, `intfloat/multilingual-e5-large-instruct`) in
  * an environment with no ONNX/torch runtime.
  *
  * Unlike [[HashingEmbedder]] (a pure per-string function), this backend
  * has everything a production model session has, so it PROVES the
  * distributed seam the reference model would use:
  *   - **weights**: hashed token-embedding table (vocab×hidden) + dense
  *     projection (hidden×dim) + bias, procedurally generated from a
  *     seed (splitmix64 → Xavier-uniform) at construction — the
  *     "model load" that must happen once per partition, never be
  *     serialized, and costs real memory (~2 MB at defaults);
  *   - **batched inference**: [[embedBatch]] runs mean-pooling into a
  *     B×hidden matrix and ONE B×hidden×dim GEMM for the whole batch +
  *     tanh + L2-normalize — per-row [[embed]] delegates to a batch of
  *     one, so batched and unbatched outputs are bit-identical (spec-
  *     gated), exactly the invariant an ONNX session must also keep.
  *
  * Swap-in path for a real model: keep `Embedders.embedDistributed(df,
  * col, () => new OnnxEmbedder(path))` and only the construction body
  * changes; every operator upstream/downstream is untouched.
  *
  * Environment probe (round 3, recorded per the round-2 review): the
  * sandbox has NO inference runtime to swap in — no onnxruntime /
  * djl / torch / tokenizers jar in `/opt/spark/jars` (287 jars, only
  * MLlib + breeze + netlib BLAS), none in the offline coursier/ivy
  * caches, no Python onnxruntime/torch, and no pretrained weight
  * files (`*.onnx`/`*.safetensors`/`*.gguf`) anywhere on disk. The
  * real-weights gap is therefore pinned to the environment, not to
  * this seam. */
final class NeuralEmbedder(val dim: Int = 64, val hidden: Int = 128,
                           val vocab: Int = 4096, seed: Long = 42L) extends Embedder {
  import NeuralEmbedder._

  constructions.incrementAndGet() // spec hook: count per-partition inits

  // --- procedurally generated weights (deterministic in seed) ---------
  private val embTable: Array[Float] = xavier(vocab * hidden, vocab, hidden, seed ^ 0x1L)
  private val w: Array[Float] = xavier(hidden * dim, hidden, dim, seed ^ 0x2L)
  private val bias: Array[Float] = xavier(dim, hidden, dim, seed ^ 0x3L)

  def embed(text: String): Array[Float] =
    embedBatch(Iterator.single(text)).next()

  /** Batched forward pass: pool → GEMM → tanh → L2. */
  override def embedBatch(texts: Iterator[String]): Iterator[Array[Float]] = {
    val batch = texts.toArray
    val bsz = batch.length
    if (bsz == 0) return Iterator.empty
    maxBatchSeen.accumulateAndGet(bsz, math.max)
    // mean-pool token embeddings: B x hidden
    val pooled = new Array[Float](bsz * hidden)
    var r = 0
    while (r < bsz) {
      val toks = tokenize(batch(r))
      if (toks.nonEmpty) {
        val inv = 1.0f / toks.length
        for (t <- toks) {
          val row = math.floorMod(mix64(t.##.toLong ^ 0x9e37L).toInt, vocab) * hidden
          var j = 0
          while (j < hidden) { pooled(r * hidden + j) += embTable(row + j) * inv; j += 1 }
        }
      }
      r += 1
    }
    // one GEMM for the whole batch: (B x hidden) * (hidden x dim) + bias
    val out = new Array[Float](bsz * dim)
    r = 0
    while (r < bsz) {
      var k = 0
      while (k < hidden) {
        val p = pooled(r * hidden + k)
        if (p != 0.0f) {
          var j = 0
          while (j < dim) { out(r * dim + j) += p * w(k * dim + j); j += 1 }
        }
        k += 1
      }
      r += 1
    }
    // bias + tanh + L2-normalize per row
    val result = new Array[Array[Float]](bsz)
    r = 0
    while (r < bsz) {
      val v = new Array[Float](dim)
      var j = 0
      var norm = 0.0
      while (j < dim) {
        v(j) = math.tanh(out(r * dim + j) + bias(j)).toFloat
        norm += v(j).toDouble * v(j)
        j += 1
      }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < dim) { v(j) *= inv; j += 1 }
      }
      result(r) = v
      r += 1
    }
    result.iterator
  }

  private def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
}

object NeuralEmbedder {
  /** Spec hooks: how many sessions were constructed (≅ partitions) and
    * the largest batch an embedBatch call received. */
  val constructions = new AtomicInteger(0)
  val maxBatchSeen = new AtomicInteger(0)

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Xavier-uniform weights in [-sqrt(6/(fanIn+fanOut)), +...], each
    * element drawn deterministically from mix64(seed, index). */
  private def xavier(n: Int, fanIn: Int, fanOut: Int, seed: Long): Array[Float] = {
    val limit = math.sqrt(6.0 / (fanIn + fanOut)).toFloat
    val a = new Array[Float](n)
    var i = 0
    while (i < n) {
      // 53-bit mantissa → uniform in [0,1) → scale to [-limit, limit)
      val u = (mix64(seed * 0x100000001b3L + i) >>> 11).toDouble / (1L << 53).toDouble
      a(i) = ((2.0 * u - 1.0) * limit).toFloat
      i += 1
    }
    a
  }
}
