package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's collection/namespace system re-expressed as ONE
  * logical table with a `collection` column (SURVEY §1.2): ChromaDB's
  * six persist directories collapse to a partition column, and the
  * dual-write / cascade-delete invariants become plain dataset algebra.
  *
  * At 100 TB the physical layout is parquet/Delta partitioned BY
  * `collection`: partition pruning turns every per-collection operation
  * into a scan of just that partition, and `DELETE WHERE doc_id=?`
  * becomes a metadata-only Delta op. Here the transforms are expressed
  * engine-side so they compose with any storage.
  */
object ChunkStore {

  /** B11: dual-write — tag rows with their origin and append both the
    * target-collection copy and the master copy (`vector_store.py:91-137`).
    * One input row becomes two output rows (or one if target IS master),
    * both tagged `original_collection = target`. */
  def dualWrite(rows: DataFrame, targetCollection: String,
                master: String = "master"): DataFrame = {
    val tagged = rows
      .withColumn("original_collection", lit(targetCollection))
    if (targetCollection == master) tagged.withColumn("collection", lit(master))
    else tagged.withColumn("collection", lit(targetCollection))
      .unionByName(tagged.withColumn("collection", lit(master)))
  }

  /** B9: global duplicate guard — batch form of
    * `document_exists_globally` (`vector_store.py:70-89`): keep only the
    * incoming rows whose key does NOT already exist anywhere in the
    * corpus. Left-anti join; Catalyst broadcasts the smaller side. */
  def dropExistingGlobal(incoming: DataFrame, corpus: DataFrame,
                         incomingKey: String, corpusKey: String): DataFrame =
    incoming.join(corpus.select(col(corpusKey).as(incomingKey)).distinct(),
      Seq(incomingKey), "left_anti")

  /** Build a reusable bloom filter over the corpus keys for
    * [[dropExistingGlobalBloom]] — ONE corpus pass (mergeable partial
    * filters per partition, OR-merged on the driver), amortized across
    * every ingest batch until the next rebuild. Keys are probed through
    * their string form so incoming/corpus key dtypes never have to
    * match. Size it honestly: the filter costs ~`-ln(fpp)/ln(2)²` bits
    * per expected item (≈10 bits/key at fpp 0.01), so 10⁹ corpus keys
    * ≈ 1.2 GB of broadcast — at that scale raise fpp (every false
    * positive only costs an exact re-check, never a wrong answer). */
  def buildKeyBloom(corpus: DataFrame, keyCol: String, expectedItems: Long,
                    fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    corpus.select(col(keyCol).cast("string").as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)

  /** B9 for a 100 TB corpus: bloom-guarded duplicate drop. The plain
    * [[dropExistingGlobal]] anti-join SHUFFLES the corpus keys for
    * EVERY ingest batch (a left-anti join can only build-broadcast its
    * right side — the corpus — which at 100 TB it never can). With a
    * prebuilt corpus [[buildKeyBloom]] filter the confirm inverts:
    * bloom-positive incoming KEYS (true duplicates plus an
    * fpp-fraction of false alarms — a tiny, column-pruned projection
    * of the batch) broadcast INTO a semi-join against the corpus,
    * which therefore scans its key column once and never shuffles;
    * the resulting confirmed-duplicate key set is at most the batch
    * size, so the final anti-join against the full incoming rows
    * build-broadcasts it. Bloom-negative keys are *definitely* new
    * (no false negatives) — they skip the semi-join probe and survive
    * the final anti-join by construction.
    *
    * The result is EXACTLY the plain anti-join's (false positives are
    * re-checked, null keys take the no-match path both ways — spec-
    * pinned even at fpp 0.5). A filter gone stale after corpus appends
    * misses only the appended keys, so rebuild whenever the corpus
    * grows — the intended cadence is rebuild-per-compaction,
    * probe-per-microbatch. `incoming` is referenced by two plan
    * subtrees (the key probe and the final anti-join); micro-batches
    * are in memory already, persist larger inputs. */
  def dropExistingGlobalBloom(incoming: DataFrame, corpus: DataFrame,
                              incomingKey: String, corpusKey: String,
                              bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val bc = incoming.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: String) => k != null && bc.value.mightContainString(k))
    val positiveKeys = incoming
      .select(col(incomingKey))
      .filter(might(col(incomingKey).cast("string")))
      .distinct()
    val confirmedDups = corpus.select(col(corpusKey).as(incomingKey))
      .join(broadcast(positiveKeys), Seq(incomingKey), "left_semi")
      // the semi-join keeps corpus-side MULTIPLICITY — a key duplicated
      // heavily in a dirty corpus (exactly what a dup guard exists for)
      // would blow the forced broadcast below without this distinct
      .distinct()
    // after distinct, confirmedDups ≤ the batch's key count — hint it
    // explicitly, since its size ESTIMATE derives from corpus stats
    incoming.join(broadcast(confirmedDups), Seq(incomingKey), "left_anti")
  }

  /** B10: per-collection duplicate guard (`vector_store.py:56-68`) —
    * same anti-join with the collection predicate pushed into the scan. */
  def dropExistingInCollection(incoming: DataFrame, corpus: DataFrame,
                               collection: String, incomingKey: String,
                               corpusKey: String,
                               collectionCol: String = "collection"): DataFrame =
    dropExistingGlobal(incoming,
      corpus.filter(col(collectionCol) === collection), incomingKey, corpusKey)

  /** B9 point form: does `key` exist anywhere? (LIMIT-1 existence probe,
    * `vector_store.py:80` — Spark plans it as CollectLimit, early-exit.) */
  def existsGlobally(corpus: DataFrame, keyCol: String, key: Any): Boolean =
    !corpus.filter(col(keyCol) === lit(key)).limit(1).isEmpty

  /** D1+D2: delete-by-doc_id with master cascade
    * (`vector_store.py:190-298`). Predicate-driven over the single
    * table, so the reference's "peek original_collection then delete
    * twice" collapses to one delete over both partitions; `collections`
    * restricts the blast radius exactly like the reference's two cases.
    * Returns the surviving rows (parquet path: rewrite; Delta: DELETE). */
  def deleteDocument(chunks: DataFrame, docId: Any,
                     collections: Option[Seq[String]] = None,
                     docCol: String = "doc_id",
                     collectionCol: String = "collection"): DataFrame = {
    val victim = collections match {
      case Some(cs) => col(docCol) === lit(docId) && col(collectionCol).isin(cs.map(lit): _*)
      case None     => col(docCol) === lit(docId)
    }
    // null-safe negation: under three-valued logic, a row with a null
    // key would make `victim` NULL and `!victim` NULL — silently deleted
    // by EVERY delete; coalesce keeps unmatched-by-null rows
    chunks.filter(!coalesce(victim, lit(false)))
  }

  /** Collection-name validation (`get_vector_store`,
    * `vector_store.py:48-54`: unknown collection → ValueError). */
  def requireCollection(name: String,
                        known: Seq[String] = graft.ChunkSchema.collections): String = {
    require(known.contains(name),
      s"Unknown collection: '$name'. Known collections: ${known.mkString(", ")}")
    name
  }

  /** E1: retriever factory (`vector_store.py:173-188`) — curry a
    * collection + k + filter + query embedder into a `query => topK`
    * function, the LangChain-retriever shape without the framework. */
  def retriever(chunks: DataFrame, collection: String, k: Int,
                embedQuery: String => Seq[Float],
                filter: Option[Column] = None,
                collectionCol: String = "collection",
                embCol: String = "embedding",
                idCol: String = "chunk_id"): String => DataFrame = {
    val scoped = chunks.filter(col(collectionCol) === collection)
    query => VectorSearch.topKWithScore(
      scoped, embedQuery(query), k, VectorSearch.L2Sq, filter, embCol, idCol)
  }

  /** E1 with the reference's wire-level filter form: the Chroma
    * `where`-dict JSON an API caller sends (`README.md:186-193`,
    * `app.py:381,411`) parsed into the pushdown predicate — what a
    * drop-in replacement of the reference's `/search` accepts. */
  def retrieverWithWhere(chunks: DataFrame, collection: String, k: Int,
                         embedQuery: String => Seq[Float],
                         whereJson: String): String => DataFrame =
    retriever(chunks, collection, k, embedQuery,
      filter = Some(graft.functions.WhereFilter.parse(whereJson)))

  /** E2: store initialization (`vector_store.py:16-46`) — ensure the
    * partitioned table exists with the canonical chunk schema; idempotent
    * (CREATE IF NOT EXISTS semantics for a parquet layout).
    *
    * A zero-row `partitionBy` write emits only `_SUCCESS` (no schema
    * footer → later reads fail with UNABLE_TO_INFER_SCHEMA), so the
    * empty table is materialized as one footer-bearing empty part file
    * INSIDE a hive-style partition directory per collection: partition
    * discovery then yields the full schema including the partition
    * column. */
  def initializeStore(spark: org.apache.spark.sql.SparkSession, path: String,
                      schema: org.apache.spark.sql.types.StructType,
                      collections: Seq[String] = Seq("master")): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataSchema = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == "collection"))
    lazy val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), dataSchema).repartition(1)
    // per-collection existence check (not root-only): a crash between
    // writes, or a collection added later, is repaired on the next call
    collections.foreach { c =>
      val cPath = new org.apache.hadoop.fs.Path(s"$path/collection=$c")
      if (!fs.exists(cPath)) {
        empty.write.mode("overwrite").parquet(cPath.toString)
      }
    }
  }

  /** D3: affected-row accounting that replaces the reference's tri-flag
    * success lattice (`vector_store.py:196-298`) — per-collection counts
    * of deleted rows. Pass `collections` to get an explicit
    * `deleted_rows = 0` row for consulted-but-empty collections (the
    * lattice's "not found counts as success" state); without it, only
    * collections that actually matched appear. */
  def deleteReport(chunks: DataFrame, docId: Any,
                   docCol: String = "doc_id",
                   collectionCol: String = "collection",
                   collections: Option[Seq[String]] = None): DataFrame = {
    val matched = chunks.filter(col(docCol) === lit(docId))
      .groupBy(col(collectionCol))
      .agg(count(lit(1)).as("deleted_rows"))
    collections match {
      case None => matched
      case Some(cs) =>
        val spark = chunks.sparkSession
        import spark.implicits._
        cs.toDF(collectionCol)
          .join(matched, Seq(collectionCol), "left_outer")
          .na.fill(0L, Seq("deleted_rows"))
    }
  }
}
