package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HashingEmbedder
import graft.operators.{ChunkStore, TextChunker}

/** Structured-Streaming ingest surface (SURVEY §2.F notes the reference
  * is synchronous request/response; the streaming file-source +
  * foreachBatch upsert is the natural Spark generalization, and the
  * events table gives the watermark/window shapes a training pipeline
  * needs).
  *
  * All transforms are expressed on unbounded DataFrames — identical code
  * paths to the batch operators (chunk → embed → dual-write), which is
  * the point: the engine's operators are stream-agnostic.
  */
object StreamingIngest {

  /** Streaming document ingest: a file-source stream of document rows →
    * chunk → hash-embed → dual-write rows, written via foreachBatch so
    * each micro-batch can run the B9 dup guard against the existing corpus
    * (merge/upsert semantics; exactly-once per batch epoch). */
  def documentIngestStream(spark: SparkSession, inputDir: String,
                           schema: org.apache.spark.sql.types.StructType,
                           targetCollection: String)(
      upsert: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    val docs = spark.readStream.schema(schema).parquet(inputDir)
    val chunks = transformDocuments(docs, targetCollection)
    chunks.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, epochId: Long) => upsert(batch, epochId) }
  }

  /** Streaming JSONL ingest with quarantine — the stream twin of
    * [[graft.sources.JsonlDocs]]: tail a directory of JSONL files and
    * emit ONE stream carrying `is_good`/`raw_line` plus the schema
    * columns. The parse IS the batch parse
    * ([[graft.sources.JsonlDocs.statusFromLines]] on a streaming lines
    * source), so stream==batch parity holds by construction. Downstream
    * splits good rows into the corpus and bad lines into a quarantine
    * sink inside one foreachBatch — the micro-batch is read once and
    * both sinks advance in the same epoch; parquet appends replay
    * at-least-once on epoch retry, so key idempotent consumers by
    * epochId (or overwrite an epoch-derived partition). */
  def jsonlIngestStream(spark: SparkSession, inputDir: String,
                        schema: org.apache.spark.sql.types.StructType): DataFrame =
    graft.sources.JsonlDocs.statusFromLines(
      spark.readStream.text(inputDir), schema)

  /** Streaming WARC ingest: tail a landing directory of `.warc(.gz)`
    * segments (the Common Crawl drop layout — new segments appear as
    * whole files, which is exactly the file source's contract) with
    * the binaryFile source and explode each new archive through the
    * SAME parse + extract as batch
    * [[graft.sources.WarcIngest.ingestWarcs]] — stream==batch parity
    * by construction. Stateless narrow plan (parse + extract inside
    * the scan task, no aggregation, no state store), any output mode;
    * parquet appends replay at-least-once on epoch retry (see
    * [[jsonlIngestStream]]). */
  def warcIngestStream(spark: SparkSession, inputDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    graft.sources.WarcIngest.ingestWarcs(
      spark.readStream.format("binaryFile")
        .schema(binaryFileSchema).load(inputDir))
  }

  /** Streaming crawl front door — the STATELESS crawl stages beside
    * the WARC stream: frontier-normalize the page URL
    * ([[graft.operators.Urls.normalizeUrl]]), honor the host's robots
    * policy (the PRODUCTION [[graft.sources.RobotsTxt.filterByRobots]]
    * as a stream-static join against the small per-host robots frame —
    * parity with batch by construction), and extract the fused head
    * signals: noindex pages drop, survivors carry `canonical` (their
    * resolved group key). The canonical COLLAPSE itself is
    * corpus-global and stays a batch/at-rest job by design (the
    * dedup/train rule); this stream emits exactly the per-page columns
    * that at-rest collapse consumes. Stateless narrow plan plus one
    * broadcastable static join: no aggregation, no state store, any
    * output mode. */
  def crawlPageStream(pages: DataFrame, robots: DataFrame,
                      userAgent: String, urlCol: String = "url",
                      htmlCol: String = "html"): DataFrame =
    graft.sources.RobotsTxt.filterByRobots(
        pages.withColumn(urlCol,
          graft.operators.Urls.normalizeUrlCol(col(urlCol))),
        robots, userAgent)
      .withColumn("canonical",
        graft.operators.Urls.canonicalKeyCol(col(urlCol), col(htmlCol)))
      .where(col("canonical").isNotNull)

  /** Streaming link discovery: [[crawlPageStream]]'s continuation —
    * the PRODUCTION [[graft.operators.LinkGraph.extractLinks]] over
    * each arriving page (per-row flatMap: resolve + normalize +
    * nofollow/self/scheme hygiene), emitting one row per discovered
    * frontier key. Stateless, so batch==stream by construction; the
    * corpus-global stages that CONSUME the discovered links —
    * pageRank, canonical collapse, frontier dedup — stay batch by
    * design, exactly like the collapse in [[crawlPageStream]]. */
  def linkDiscoveryStream(pages: DataFrame, urlCol: String = "url",
                          htmlCol: String = "html",
                          skipNofollow: Boolean = true): DataFrame =
    graft.operators.LinkGraph.extractLinks(pages, urlCol, htmlCol,
      skipNofollow)

  /** Streaming CSV ingest: the [[jsonlIngestStream]] twin over the
    * positional format — the same shared lines→status parse as batch
    * [[graft.sources.CsvDocs]], so stream==batch parity (including the
    * short-row-quarantines contract) holds by construction. */
  def csvIngestStream(spark: SparkSession, inputDir: String,
                      schema: org.apache.spark.sql.types.StructType): DataFrame =
    graft.sources.CsvDocs.statusFromLines(
      spark.readStream.text(inputDir), schema)

  /** Streaming sharded export: append each micro-batch to a
    * shard-partitioned lake directory via the SAME
    * [[graft.operators.Sharding.exportShards]] pipeline as batch — a
    * doc ingested via the stream lands in the identical shard directory
    * a batch re-export would choose, so batch and streaming exports can
    * be mixed, diffed, and compacted freely. Appends replay
    * at-least-once on epoch retry (see [[jsonlIngestStream]]). */
  def exportShardedStream(docs: DataFrame, keyCol: String, nShards: Int,
                          path: String): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Sharding.exportShards(batch, keyCol, nShards, path,
          org.apache.spark.sql.SaveMode.Append)
      }

  /** The shared (batch==stream) document transform: chunk → embed →
    * dual-write tag. */
  def transformDocuments(docs: DataFrame, targetCollection: String): DataFrame =
    ChunkStore.dualWrite(
      HashingEmbedder.withEmbedding(
        TextChunker.chunkDocuments(docs), "content"),
      targetCollection)

  /** Windowed event aggregation with watermark: per (1-minute window,
    * event_type) counts and value sums; late events beyond the watermark
    * are dropped — state is bounded, which is what makes this run
    * forever at scale. */
  def windowedEventCounts(events: DataFrame, watermark: String = "2 minutes",
                          window: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact-dedup guard — the stream twin of the B9 dup guard
    * and batch `Dedup.dropDuplicates`: fingerprint the text (md5, same
    * as the batch path) and keep the first arrival per fingerprint
    * within the watermark via `dropDuplicatesWithinWatermark`. State is
    * bounded by the watermark (fingerprints older than it are evicted),
    * which is what lets a training-data ingest stream run forever; the
    * batch dedup at rest catches anything that re-arrives later. */
  def dedupDocStream(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", graft.operators.Dedup.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming curation: the stream twin of the `curation_pipeline`
    * gate's map-side stages — PII scrub + quality/length gate as one
    * narrow projection+filter, so it attaches to any document stream
    * with zero state and zero shuffle (decontamination and corpus-wide
    * dedup stay batch/at-rest jobs by design: they need corpus-global
    * state no watermark can bound). Emits only kept documents with the
    * redacted payload as `text`. */
  def curateDocStream(docs: DataFrame, textCol: String = "text",
                      stopwords: Seq[String] = Seq("the", "a"),
                      minQuality: Double = 0.5,
                      minTokens: Int = 10, maxTokens: Int = 100000)
      : DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("quality_score",
        graft.operators.TextAnalysis.qualityScore(t, stopwords))
      .withColumn("n_tokens",
        graft.operators.TextAnalysis.tokenCount(t).cast("long"))
      .where(col("quality_score") >= minQuality &&
        col("n_tokens").between(minTokens, maxTokens))
      .withColumn("has_pii",
        graft.operators.Pii.emailCount(t) +
          graft.operators.Pii.phoneCount(t) +
          graft.operators.Pii.ipCount(t) > 0)
      // redact LAST: has_pii above must see the original text
      .withColumn(textCol, graft.operators.Pii.redact(t))
  }

  /** Streaming classifier scoring: the stream twin of `cls_nb_gate`'s
    * score stage. The trained NB model (train stays a batch/at-rest
    * job by design — it needs corpus-global counts) rides the closure
    * as a Map, so scoring is one stateless narrow projection: no
    * aggregation, no state store, any output mode. Batch==stream
    * integer parity is spec-gated ([[graft.operators.CorpusModels
    * .nbScoreColumn]] produces exactly `nbScore`'s long sums). */
  def scoreDocStream(docs: DataFrame, model: Map[String, Long],
                     priorFp: Long, textCol: String = "text"): DataFrame =
    docs
      .withColumn("score_fp",
        graft.operators.CorpusModels.nbScoreColumn(model, priorFp)(col(textCol)))
      .withColumn("keep_pred", col("score_fp") > 0)

  /** Streaming GRAPH-index maintenance: the stream twin of the
    * nightly [[graft.operators.Hnsw.appendToShards]], completing the
    * graph family's batch/serve/stream matrix (the reference's
    * per-upload hnswlib `add_items` loop, restated as micro-batch
    * maintenance). Each micro-batch: resolve the CURRENT immutable
    * graph version (the one pointer protocol —
    * [[graft.operators.Maintenance.resolveCurrent]]), route arrivals
    * with the SAME f64-argmin assignment kernel as batch and the
    * online server ([[graft.operators.Ann.assignToIvf]] /
    * `Ann.nearestCentroid`), append into only the touched shard
    * graphs, and publish the result as a NEW immutable version
    * ([[graft.operators.CorpusModels.publishModelVersion]]). A
    * resident prober resolving
    * [[graft.serving.Serving.currentModelDir]] therefore never sees a
    * torn graph, and its freshness-keyed caches warm per version.
    *
    * Epoch-idempotent, not just at-least-once: each applied epoch
    * writes an `_epoch_<id>_<content-fingerprint>` marker INTO the
    * version it publishes (before the atomic rename), and a replayed
    * epoch (checkpoint recovery) that finds its own marker in the
    * CURRENT version is skipped. The fingerprint (row count +
    * order-insensitive xxhash64 id xor) scopes the skip to THIS
    * batch's content: a fresh checkpoint or second stream whose
    * epoch 0 carries DIFFERENT rows misses the marker and applies
    * normally — a bare-epochId marker would silently drop that new
    * data. A same-content re-application is correctly skipped either
    * way (re-inserting the same ids would only fail the dup guard).
    * Without the marker, a replay would fail loudly on duplicate
    * inserts ([[graft.operators.Hnsw.HnswGraph.insert]]'s contract) —
    * id uniqueness ACROSS distinct batches stays the upstream B9 dup
    * guard's job, as everywhere. Null-embedding rows are dropped (the
    * [[vectorIngestStream]] poison-record contract); an empty
    * surviving batch publishes nothing. The batch is persisted for
    * the epoch (fingerprint + routing + graph write each act on it) —
    * the read-once-per-epoch convention of [[jsonlIngestStream]]. */
  /** Carry every retained replay marker from the current version into
    * a freshly built one. Load-bearing when SEVERAL publishers share
    * one root (insert stream + delete stream, or a nightly batch
    * publish between stream epochs): [[graft.operators.Hnsw.saveHnsw]]
    * writes a fresh directory, so without the carry each publish would
    * DROP the other publishers' markers — an insert epoch replayed
    * after an interleaved delete publish would miss its own marker,
    * re-apply, and poison the stream on the live-id dup guard.
    * Retention is capped per marker prefix (insert vs delete) at the
    * numerically-highest epoch ids: replay only ever concerns the most
    * recent uncommitted epochs, and an unbounded carry would grow a
    * long-lived stream's versions by one empty file per epoch
    * forever. */
  /** Bounded in-epoch retry for optimistic-publish aborts. The per-root
    * JVM lock already serializes same-driver publishers, so a
    * [[graft.operators.CorpusModels.ConcurrentPublishException]] here
    * means a publisher in ANOTHER JVM flipped `_current` mid-epoch;
    * the body re-resolves the fresh version and rebuilds. Retrying
    * in-place keeps the streaming query alive (a foreachBatch throw
    * would kill it); past the bound the stream fails loudly rather
    * than livelock against a pathological publisher. */
  private def retryOnConcurrentPublish[T](what: String, attempts: Int = 5)
                                         (body: => T): T = {
    var left = attempts
    while (true) {
      try return body
      catch {
        case e: graft.operators.CorpusModels.ConcurrentPublishException =>
          left -= 1
          if (left <= 0) throw new IllegalStateException(
            s"$what: publish still racing after $attempts attempts", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def carryEpochMarkers(fs: org.apache.hadoop.fs.FileSystem,
                                cur: String, dir: String,
                                keepPerPrefix: Int = 64): Unit = {
    val markers = fs.globStatus(new org.apache.hadoop.fs.Path(s"$cur/_epoch_*"))
    if (markers != null && markers.nonEmpty) {
      def epochOf(n: String): Long = {
        val parts = n.split("_") // "", "epoch", ["del",] id, n, hash
        val idx = if (n.startsWith("_epoch_del_")) 3 else 2
        scala.util.Try(parts(idx).toLong).getOrElse(-1L)
      }
      markers.map(_.getPath.getName)
        .groupBy(_.startsWith("_epoch_del_")).values
        .foreach(_.sortBy(n => -epochOf(n)).take(keepPerPrefix).foreach { n =>
          fs.create(new org.apache.hadoop.fs.Path(s"$dir/$n"), true).close()
        })
    }
  }

  def hnswIngestStream(vectors: DataFrame, root: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val rows = batch.filter(col("embedding").isNotNull).persist()
        try {
          // order-insensitive, overflow-free content fingerprint
          // (bit_xor, the digest-jaccard-gate recipe; ids are unique
          // per batch — the dup guard's contract — so xor can't cancel)
          val fp = rows.agg(
              count(lit(1)).as("n"),
              coalesce(expr("bit_xor(xxhash64(vec_id))"), lit(0L)).as("h"))
            .head()
          val (n, h) = (fp.getLong(0), fp.getLong(1))
          if (n > 0) {
            val markerName = f"_epoch_${epochId}_${n}_$h%016x"
            // resolve → build → publish runs under the per-root publish
            // lock, pinned to the resolved snapshot via expectCurrent:
            // a sibling publisher (the delete stream, a nightly batch)
            // can otherwise flip _current between this resolve and the
            // publish, and shipping a build derived from the stale
            // snapshot would silently drop its rows/tombstones. Same-
            // JVM publishers serialize on the lock; a cross-JVM flip
            // aborts the publish (ConcurrentPublishException) and the
            // epoch retries against the fresh version — the marker
            // protocol makes the retry idempotent.
            retryOnConcurrentPublish(s"hnswIngestStream epoch $epochId") {
              graft.operators.CorpusModels.withPublishLock(root) {
                val cur = graft.operators.Maintenance.resolveCurrent(spark, root)
                val fs = new org.apache.hadoop.fs.Path(cur)
                  .getFileSystem(spark.sparkContext.hadoopConfiguration)
                if (!fs.exists(new org.apache.hadoop.fs.Path(s"$cur/$markerName"))) {
                  val idx = graft.operators.Hnsw.loadHnsw(spark, cur)
                  val routed = graft.operators.Ann.assignToIvf(
                    graft.operators.Ann.IvfIndex(idx.centroids, rows,
                      "embedding", "vec_id"),
                    rows)
                  val appended = graft.operators.Hnsw.appendToShards(
                    idx.graph, routed, idx.params)
                  graft.operators.CorpusModels.publishModelVersion(spark, root,
                    expectCurrent = Some(cur)) { dir =>
                      graft.operators.Hnsw.saveHnsw(appended, idx.centroids,
                        idx.params, dir)
                      carryEpochMarkers(fs, cur, dir)
                      fs.create(new org.apache.hadoop.fs.Path(s"$dir/$markerName"),
                        true).close()
                  }
                  ()
                }
              }
            }
          }
        } finally rows.unpersist()
        ()
      }

  /** Streaming GRAPH-index deletes: the stream twin of
    * [[graft.operators.Hnsw.deleteFromShards]], completing the delete
    * lifecycle's batch/serve/stream matrix (batch flag-flip /
    * [[graft.serving.Serving.OnlineHnsw.delete]] / this). Each
    * micro-batch of `vec_id` delete requests resolves the CURRENT
    * immutable graph version, tombstones the ids (pure column update —
    * dead nodes keep routing, never surface; ids absent from the
    * graph are ignored, the [[graft.operators.Hnsw.deleteFromShards]]
    * contract), and publishes a NEW version — the same one-pointer
    * protocol as [[hnswIngestStream]], so a resident prober never
    * sees a torn graph. Reclamation stays the nightly
    * [[graft.operators.Hnsw.compactShards]] job, exactly as for the
    * online server's tombstones.
    *
    * Epoch-idempotent via the same `_epoch_…` marker protocol as the
    * insert stream, under a `_epoch_del_` prefix so an insert epoch
    * and a delete epoch over the SAME ids (epoch 0 of two streams on
    * one root) can never satisfy each other's skip. Every publish
    * CARRIES the other publishers' retained markers forward
    * ([[carryEpochMarkers]]) — without that, an interleaved publish
    * from the sibling stream would drop this stream's marker and a
    * checkpoint replay would re-apply. A replayed delete
    * is naturally idempotent (re-flipping a flag changes nothing) —
    * the marker's job here is version economy: recovery must not
    * republish an identical graph and stampede every prober's
    * freshness-keyed cache. A batch whose ids all miss the graph
    * still publishes (detecting the no-op would cost a second full
    * join pass; delete traffic is maintenance-scale, version GC is
    * cheaper than the check). */
  def hnswDeleteStream(deleteIds: DataFrame, root: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    deleteIds.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val ids = batch.filter(col("vec_id").isNotNull)
          .select(col("vec_id").cast("long").as("vec_id"))
          .distinct().persist()
        try {
          val fp = ids.agg(
              count(lit(1)).as("n"),
              coalesce(expr("bit_xor(xxhash64(vec_id))"), lit(0L)).as("h"))
            .head()
          val (n, h) = (fp.getLong(0), fp.getLong(1))
          if (n > 0) {
            val markerName = f"_epoch_del_${epochId}_${n}_$h%016x"
            // same lock + expectCurrent protocol as [[hnswIngestStream]]
            // — the two streams are exactly the concurrent-publisher
            // pair the guard exists for
            retryOnConcurrentPublish(s"hnswDeleteStream epoch $epochId") {
              graft.operators.CorpusModels.withPublishLock(root) {
                val cur = graft.operators.Maintenance.resolveCurrent(spark, root)
                val fs = new org.apache.hadoop.fs.Path(cur)
                  .getFileSystem(spark.sparkContext.hadoopConfiguration)
                if (!fs.exists(new org.apache.hadoop.fs.Path(s"$cur/$markerName"))) {
                  val idx = graft.operators.Hnsw.loadHnsw(spark, cur)
                  val tombstoned =
                    graft.operators.Hnsw.deleteFromShards(idx.graph, ids)
                  graft.operators.CorpusModels.publishModelVersion(spark, root,
                    expectCurrent = Some(cur)) { dir =>
                      graft.operators.Hnsw.saveHnsw(tombstoned, idx.centroids,
                        idx.params, dir)
                      carryEpochMarkers(fs, cur, dir)
                      fs.create(new org.apache.hadoop.fs.Path(s"$dir/$markerName"),
                        true).close()
                  }
                  ()
                }
              }
            }
          }
        } finally ids.unpersist()
        ()
      }

  /** Streaming vector-index maintenance: new embeddings are routed to
    * their IVF cluster (broadcast k-row centroid argmin —
    * [[graft.operators.Ann.assignToIvf]], the append-without-refit
    * path) and int8-quantized ([[graft.operators.Sq.quantize]],
    * codebook-free so appends never wait on a refit) AS THEY ARRIVE —
    * the reference's add-documents flow as a stream, with the index
    * columns ready for the partitioned-by-cluster store. Both stages
    * are stateless narrow projections (no aggregation, no state
    * store, any output mode); batch==stream parity is spec-gated.
    *
    * Null-embedding rows are DROPPED here, not crashed on:
    * `assignToIvf`'s fail-loud require is right for a batch job (one
    * job fails, the operator re-runs) but a single poison record must
    * not terminate a long-running ingest stream and block everything
    * behind it. Callers who need the rejects route them first
    * (`vectors.filter(col(embCol).isNull)` → a quarantine sink, the
    * CSV/JSONL ingest pattern); `emb_health` over the landed table
    * counts what was dropped. */
  def vectorIngestStream(vectors: DataFrame,
                         index: graft.operators.Ann.IvfIndex): DataFrame =
    graft.operators.Sq.quantize(
      graft.operators.Ann.assignToIvf(index,
        vectors.filter(col(index.embCol).isNotNull)),
      embCol = index.embCol)

  /** Streaming LM-perplexity scoring: the stream twin of
    * `lm_perplexity`'s score stage, same contract as
    * [[scoreDocStream]] — the capped vocab rides the closure, scoring
    * is one stateless narrow projection (no aggregation, no state
    * store, any output mode), and batch==stream integer parity is
    * spec-gated ([[graft.operators.CorpusModels.pplScoreColumn]]
    * produces exactly `perplexity`'s long sums and division chain,
    * incl. null text → the zero row). */
  def scoreDocStreamPpl(docs: DataFrame, vocab: Map[String, Long],
                        oovFp: Long, textCol: String = "text"): DataFrame =
    docs
      .withColumn("__ppl",
        graft.operators.CorpusModels.pplScoreColumn(vocab, oovFp)(col(textCol)))
      .withColumn("n_tokens", col("__ppl.n_tokens"))
      .withColumn("nll_fp", col("__ppl.nll_fp"))
      .withColumn("cross_entropy", col("__ppl.cross_entropy"))
      .drop("__ppl")

  /** Streaming BIGRAM-LM scoring — the context-aware sibling of
    * [[scoreDocStreamPpl]], same stateless contract; parity with
    * `bigramPerplexity` (incl. the unknown-context transition DROP)
    * is spec-gated. */
  def scoreDocStreamBigramPpl(docs: DataFrame,
                              bigrams: Map[(String, String), Long],
                              contexts: Map[String, Long],
                              textCol: String = "text"): DataFrame =
    docs
      .withColumn("__ppl",
        graft.operators.CorpusModels.bigramPplScoreColumn(bigrams, contexts)(col(textCol)))
      .withColumn("n_transitions", col("__ppl.n_transitions"))
      .withColumn("nll_fp", col("__ppl.nll_fp"))
      .withColumn("cross_entropy", col("__ppl.cross_entropy"))
      .drop("__ppl")

  /** Streaming stupid-backoff scoring — same stateless contract;
    * parity with `backoffPerplexity` (nothing drops) spec-gated. */
  def scoreDocStreamBackoffPpl(docs: DataFrame,
                               bigrams: Map[(String, String), Long],
                               vocab: Map[String, Long], oovFp: Long,
                               textCol: String = "text",
                               alphaFp: Long =
                                 graft.operators.CorpusModels.StupidBackoffAlphaFp): DataFrame =
    docs
      .withColumn("__ppl",
        graft.operators.CorpusModels
          .backoffPplScoreColumn(bigrams, vocab, oovFp, alphaFp)(col(textCol)))
      .withColumn("n_transitions", col("__ppl.n_transitions"))
      .withColumn("nll_fp", col("__ppl.nll_fp"))
      .withColumn("cross_entropy", col("__ppl.cross_entropy"))
      .drop("__ppl")

  /** Streaming multiclass-NB tagging — the stream twin of
    * `cls_lang_nb`'s predict stage, same stateless contract: the
    * K·cap-bounded model maps ride the closure, tagging is one narrow
    * projection (no aggregation, no state store, any output mode),
    * and batch==stream parity (integers AND the deterministic argmax)
    * is spec-gated ([[graft.operators.CorpusModels.mcNbScoreColumn]]
    * shares `mcNbKernel` with the batch-parity path). */
  def scoreDocStreamMcNb(docs: DataFrame,
                         vocab: Map[String, Map[String, Long]],
                         classesAsc: Array[(String, Long, Long)],
                         textCol: String = "text"): DataFrame =
    docs
      .withColumn("__mc",
        graft.operators.CorpusModels.mcNbScoreColumn(vocab, classesAsc)(col(textCol)))
      .withColumn("pred_class", col("__mc.pred_class"))
      .withColumn("score_fp", col("__mc.score_fp"))
      .drop("__mc")

  /** Stream-static enrichment join: events stream × document dimension
    * table. The static side is broadcast (it is re-read per micro-batch,
    * so at scale persist it), keeping the stream side shuffle-free —
    * the standard shape for attaching corpus metadata to an event
    * stream before windowed aggregation. */
  def enrichEventsStream(events: DataFrame, docs: DataFrame,
                         eventKey: String = "doc_id",
                         docKey: String = "doc_id"): DataFrame =
    events.join(broadcast(docs),
      events(eventKey) === docs(docKey), "left_outer")
      .drop(docs(docKey))

  /** Stream-STREAM interval join with watermarks — the streaming twin
    * of `RangeJoin.pointInRange` / the `ev_range_attrib` batch query:
    * each click joins every purchase by the same user within
    * [purchase, purchase + attributionWindow]. Watermarks on BOTH sides
    * let Spark bound the join state (buffered rows older than watermark
    * + window are evicted), which is what makes the join runnable
    * forever. Expects `event_id, user_id, ts` on clicks and
    * `user_id, ts, value` on purchases, `ts` being a true timestamp. */
  def attributionStream(clicks: DataFrame, purchases: DataFrame,
                        attributionWindow: String = "24 hours",
                        watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark).alias("c")
    val p = purchases.withWatermark("ts", watermark).alias("p")
    c.join(p, expr(
        s"""c.user_id = p.user_id AND
           |c.ts >= p.ts AND
           |c.ts <= p.ts + interval $attributionWindow""".stripMargin))
      .select(col("c.event_id").as("event_id"), col("c.user_id").as("user_id"),
        col("c.ts").as("click_ts"), col("p.ts").as("purchase_ts"),
        col("p.value").as("purchase_value"))
  }

  // ----------------------------------------------------- custom state op

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class SessionState(nEvents: Long, firstTs: Long, lastTs: Long)
  case class SessionResult(user_id: Long, n_events: Long, duration_ms: Long, closed: Boolean)

  /** Per-user EVENT-TIME sessionization via flatMapGroupsWithState: a
    * session closes when the next event arrives more than `gapMs` after
    * the previous one (same gap rule as the batch twin,
    * graft.queries.EventQueries ev_sessionize). Each trigger emits every
    * session CLOSED by a gap inside/across batches plus the still-open
    * session tagged closed=false (consumers keep closed=true rows, or
    * the final open row per user at end of input). Requires
    * OutputMode.Update when run as a stream; in batch execution the
    * whole input is one trigger and all sessions (closed + final open)
    * emit exactly once. */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
                 gapMs: Long = 60000): org.apache.spark.sql.Dataset[SessionResult] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionResult](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val tss = batch.map(_.ts.getTime).toSeq.sorted
          if (tss.isEmpty) Iterator.empty
          else {
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionResult]
            var cur = state.getOption.getOrElse(SessionState(0, tss.head, tss.head))
            for (t <- tss) {
              if (cur.nEvents > 0 && t - cur.lastTs > gapMs) {
                closed += SessionResult(userId, cur.nEvents, cur.lastTs - cur.firstTs, closed = true)
                cur = SessionState(0, t, t)
              }
              cur = SessionState(cur.nEvents + 1, math.min(cur.firstTs, t), math.max(cur.lastTs, t))
            }
            state.update(cur)
            (closed :+ SessionResult(userId, cur.nEvents, cur.lastTs - cur.firstTs, closed = false))
              .iterator
          }
      }
  }
}
