package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data export (north-star scope):
  * trainers consume fixed-token-budget sequences, and packing multiple
  * short documents into one sequence is what keeps the accelerator
  * utilization high. [[packDocs]] is the document-granularity
  * (boundary-respecting) variant: docs are never split, a doc larger
  * than the budget gets a pack of its own. [[windowDocs]] is the
  * complementary splitting step — oversize docs become fixed-token
  * overlapping windows FIRST, then the windows pack; subword-exact
  * budgets compose via `Bpe.encodeColumn` (the `pack_bpe` gate).
  *
  * Determinism and scale come from the same construction as
  * [[Sharding]]: packing order is (shard, doc_id) — shard assignment is
  * content-addressed, doc order is total — so the SAME packs come out
  * of any cluster size or partition count. Packing is inherently
  * sequential WITHIN a shard (each verdict depends on the running
  * total) and embarrassingly parallel ACROSS shards: one shuffle
  * co-locates each shard, one in-partition sort fixes scan order, and a
  * single mapPartitions pass assigns pack ids. At 100 TB the unit of
  * parallelism is the shard count — size nShards to the cluster, not
  * the corpus. */
object Packing {

  /** Next-fit packing state machine over one partition's sorted rows.
    * Rows MUST arrive sorted by (shard, id); state resets on shard
    * change. Emits (id, shard, pack_id, pack_pos, n_tokens), packs and
    * positions 1-based. */
  private def scanPartition(budget: Long)(
      rows: Iterator[(Long, Long, Long)]): Iterator[(Long, Long, Long, Long, Long)] =
    new Iterator[(Long, Long, Long, Long, Long)] {
      private var curShard = Long.MinValue
      private var packId = 0L
      private var packPos = 0L
      private var cum = 0L
      override def hasNext: Boolean = rows.hasNext
      override def next(): (Long, Long, Long, Long, Long) = {
        val (id, n, shard) = rows.next()
        if (shard != curShard) { curShard = shard; packId = 0; cum = 0 }
        // every processed doc is a member, so the current pack is never
        // empty past packId==0 — the overflow test alone is the new-pack
        // condition. (A `cum > 0 &&` guard would let an oversize doc
        // join a pack opened by zero-token docs, breaking the
        // oversize-docs-pack-alone contract.)
        if (packId == 0 || cum + n > budget) {
          packId += 1; packPos = 0; cum = 0
        }
        packPos += 1
        cum += n
        (id, shard, packId, packPos, n)
      }
    }

  /** Pack documents into fixed-token-budget sequences: one row per doc
    * with its (shard, pack_id, pack_pos) assignment. `idCol` must be
    * LongType (or castable); token counts use TextAnalysis semantics
    * via the caller-supplied `tokensCol`. */
  def packDocs(docs: DataFrame, idCol: String, tokensCol: String,
               nShards: Int, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val assigned = Sharding.assignShards(docs, idCol, nShards)
      .select(col(idCol).cast("long"), col(tokensCol).cast("long"),
        col("shard"))
      .as[(Long, Long, Long)]
    val packed: Dataset[(Long, Long, Long, Long, Long)] = assigned
      // one shard never straddles two partitions → per-shard scan state
      // is complete; nShards tasks carry the sequential phase
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .mapPartitions(scanPartition(budget))
    packed.toDF(idCol, "shard", "pack_id", "pack_pos", "n_tokens")
  }

  /** Render packed assignments into trainer-ready sequences: join the
    * [[packDocs]] assignment back to the payloads and concatenate each
    * pack's documents in pack_pos order with `sep` between them (the
    * EOS/document-boundary marker every causal-LM data pipeline
    * inserts). Output: one row per pack — (shard, pack_id, n_docs,
    * pack_tokens, pack_text).
    *
    * One id-keyed join + one (shard, pack_id) agg; the in-pack order
    * comes from sorting the collected (pack_pos, text) structs INSIDE
    * the aggregation — no window, no second shuffle. A pack is at most
    * `budget` tokens by construction, so the per-row collect_list is
    * budget-bounded, never corpus-bounded. A null text renders as the
    * EMPTY document (its boundary marker survives) — `array_join`
    * would otherwise silently drop the element AND its separator,
    * leaving pack_text disagreeing with its own n_docs/pack_tokens. */
  def renderPacks(docs: DataFrame, packed: DataFrame, idCol: String,
                  textCol: String, sep: String = "<|endoftext|>"): DataFrame =
    packed
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("pack_pos"), coalesce(col(textCol), lit(""))
                .as(textCol)))),
            x => x.getField(textCol)),
          sep).as("pack_text"))

  /** Pack-level roll-up: docs per pack, token fill, fill ratio against
    * the budget — the report that tells you whether the budget/shard
    * parameters waste accelerator time. */
  def packStats(docs: DataFrame, idCol: String, tokensCol: String,
                nShards: Int, budget: Long): DataFrame =
    packDocs(docs, idCol, tokensCol, nShards, budget)
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill_ratio",
        // oversize single-doc packs exceed the budget by design; report
        // fill against the larger of the two so the ratio stays <= 1
        col("pack_tokens").cast("double") /
          greatest(col("pack_tokens"), lit(budget)).cast("double"))

  /** Split each document into fixed-size overlapping token windows —
    * the context-length chunking step trainers run before packing
    * (windows of `windowTokens`, consecutive starts `strideTokens`
    * apart, so adjacent windows overlap by windowTokens − strideTokens).
    *
    * Tokens are whitespace units (split on ' ', empties dropped) —
    * the same unit as [[Sharding.shardStats]] / `TextAnalysis`; for
    * subword-exact windows tokenize first and window the token array.
    * Every doc emits ≥ 1 window (an empty OR NULL-text doc emits one
    * empty window — the token array is coalesced, so null cannot
    * silently drop a doc through null-propagating `sequence`/`explode`,
    * preserving corpus membership); the last window may be shorter than
    * `windowTokens`. Window count uses pure integer arithmetic
    * (`1 + (n − W + S − 1) DIV S` when n > W) so the DuckDB oracle
    * reproduces boundaries exactly — no float `ceil` anywhere.
    *
    * Output: (idCol, window_id, n_tokens, window_text), window_id
    * 0-based. One narrow projection + one generate — no shuffle, no
    * full-token-stream materialization beyond each row's own array;
    * at 100 TB this pipelines straight into the pack/export shuffle. */
  def windowDocs(docs: DataFrame, idCol: String, textCol: String,
                 windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive, got $windowTokens")
    require(strideTokens > 0 && strideTokens <= windowTokens,
      s"strideTokens must be in [1, windowTokens], got $strideTokens")
    docs
      .select(col(idCol),
        coalesce(array_remove(split(col(textCol), " "), ""),
          array().cast("array<string>")).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__nwin",
        when(col("__n") <= windowTokens, lit(1L)).otherwise(
          lit(1L) + expr(s"(__n - $windowTokens + $strideTokens - 1) DIV $strideTokens")))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(expr("sequence(0, __nwin - 1)")).as("window_id"))
      .select(col(idCol), col("window_id"),
        slice(col("__toks"),
          (col("window_id") * strideTokens + lit(1)).cast("int"),
          lit(windowTokens)).as("__win"))
      .select(col(idCol), col("window_id"),
        size(col("__win")).cast("long").as("n_tokens"),
        array_join(col("__win"), " ").as("window_text"))
  }
}
