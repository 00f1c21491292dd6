package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Catalog, ChunkStore}

/** SURVEY §2.C catalog/listing + §2.B store-maintenance + §2.D mutation
  * surface as driver-checkable queries with DuckDB oracles.
  *
  * The chunk corpus is derived IN-QUERY from `documents.parquet` by a
  * SQL-expressible token explode (one chunk per whitespace token) so both
  * engines construct the identical corpus — the real chunker (B4/B5,
  * graft.operators.TextChunker) is covered by scalatest because greedy
  * merge-with-overlap is not expressible in ANSI SQL.
  */
object CatalogQueries {

  /** Word-level chunk corpus: (doc_id, source, lang, chunk_index, content). */
  private def wordChunks(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        posexplode(split(col("text"), " ")).as(Seq("chunk_index", "content")))
      .filter(col("content") =!= "")

  private val chunksCte =
    """WITH chunks AS (
      |  SELECT doc_id, source, lang,
      |         unnest(range(len(string_split(text, ' ')))) AS chunk_index,
      |         unnest(string_split(text, ' ')) AS content
      |  FROM documents
      |)
      |SELECT * FROM chunks WHERE content <> ''""".stripMargin

  /** Dual-origin corpus used by the mutation queries: docs < 50 uploaded
    * to `strategy_documents`, docs 50-99 to `compliance_documents`, each
    * dual-written to master (B11 invariant, `vector_store.py:91-137`). */
  private def mutationCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    ChunkStore.dualWrite(docs.filter(col("doc_id") < 50), "strategy_documents")
      .unionByName(ChunkStore.dualWrite(
        docs.filter(col("doc_id") >= 50 && col("doc_id") < 100), "compliance_documents"))
  }

  private val mutationCorpusCte =
    """WITH base AS (SELECT doc_id, source FROM documents WHERE doc_id < 50),
      |     base2 AS (SELECT doc_id, source FROM documents WHERE doc_id >= 50 AND doc_id < 100),
      |     corpus AS (
      |       SELECT doc_id, source, 'strategy_documents' AS original_collection,
      |              'strategy_documents' AS collection FROM base
      |       UNION ALL
      |       SELECT doc_id, source, 'strategy_documents', 'master' FROM base
      |       UNION ALL
      |       SELECT doc_id, source, 'compliance_documents', 'compliance_documents' FROM base2
      |       UNION ALL
      |       SELECT doc_id, source, 'compliance_documents', 'master' FROM base2
      |     )""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1: full collection scan (`store.get()`, app.py:464) — lang as the
    // collection stand-in; partition pruning at scale.
    "c1_collection_scan" -> { (s, dir) =>
      Catalog.collectionScan(Tables.documents(s, dir), "en", collectionCol = "lang")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    // C2: distinct documents — dedup by doc_id keeping first-seen name
    // (app.py:466-473); first = lowest chunk_index, deterministic.
    "c2_distinct_docs" -> { (s, dir) =>
      Catalog.distinctDocuments(wordChunks(s, dir), docCol = "doc_id",
          nameCol = "content", orderCol = "chunk_index")
        .withColumnRenamed("content", "first_chunk")
        .orderBy(col("doc_id"))
    },
    // C3: chunks grouped per document in chunk order (app.py:549-577) —
    // emitted as a '|'-joined string for engine-agnostic hashing.
    "c3_chunks_by_doc" -> { (s, dir) =>
      wordChunks(s, dir)
        .groupBy(col("doc_id"))
        .agg(
          array_join(transform(array_sort(collect_list(struct(col("chunk_index"), col("content")))),
            x => x.getField("content")), "|").as("chunks_concat"),
          count(lit(1)).as("chunk_count"))
        .orderBy(col("doc_id"))
    },
    // B9: global duplicate guard, batch anti-join form
    // (vector_store.py:70-89): incoming = French docs, corpus = doc_id%3=0.
    "b9_dup_guard" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      ChunkStore.dropExistingGlobal(
          docs.filter(col("lang") === "fr").select(col("doc_id"), col("source")),
          docs.filter(col("doc_id") % 3 === 0), "doc_id", "doc_id")
        .orderBy(col("doc_id"))
    },
    // B9 bloom form: same guard semantics as b9_dup_guard, but the
    // corpus is consulted through a prebuilt bloom filter — only
    // bloom-positive rows reach the exact anti-join confirm. fpp 0.2
    // deliberately forces false positives through the confirm path;
    // the result must still hash-match the plain anti-join's oracle.
    "b9_dup_guard_bloom" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") % 3 === 0)
      val bloom = ChunkStore.buildKeyBloom(corpus, "doc_id",
        expectedItems = 200, fpp = 0.2)
      ChunkStore.dropExistingGlobalBloom(
          docs.filter(col("lang") === "fr").select(col("doc_id"), col("source")),
          corpus, "doc_id", "doc_id", bloom)
        .orderBy(col("doc_id"))
    },
    // B11: dual-write tagging (vector_store.py:91-137) — one upload
    // becomes a target-collection row and a master row, both tagged
    // original_collection.
    "b11_dual_write" -> { (s, dir) =>
      ChunkStore.dualWrite(
          Tables.documents(s, dir).filter(col("doc_id") < 50)
            .select(col("doc_id"), col("source")), "strategy_documents")
        .orderBy(col("collection"), col("doc_id"))
    },
    // D1+D2: delete doc 7 from its collection AND master (cascade,
    // vector_store.py:190-298) — survivors returned.
    "d1_delete_cascade" -> { (s, dir) =>
      ChunkStore.deleteDocument(mutationCorpus(s, dir), 7L,
          Some(Seq("strategy_documents", "master")))
        .orderBy(col("collection"), col("doc_id"))
    },
    // D3: per-collection affected-row report replacing the tri-flag
    // success lattice (vector_store.py:196-298).
    "d3_delete_report" -> { (s, dir) =>
      ChunkStore.deleteReport(mutationCorpus(s, dir), 7L)
        .orderBy(col("collection"))
    },
    // B10: per-collection duplicate guard (vector_store.py:56-68) —
    // the B9 anti-join with the collection predicate pushed into the
    // scan (lang as collection stand-in).
    "b10_dup_guard_coll" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      ChunkStore.dropExistingInCollection(
          docs.filter(col("doc_id") >= 400).select(col("doc_id"), col("source")),
          docs.select(col("doc_id"), col("source"), col("lang")),
          "de", "doc_id", "doc_id", collectionCol = "lang")
        .orderBy(col("doc_id"))
    },
    // B7: scalar-only metadata enforcement (document_processor.py:154-163)
    // — blank/null-keyed entries dropped from the metadata map.
    "b7_meta_sanitize" -> { (s, dir) =>
      val withMeta = Tables.documents(s, dir)
        .withColumn("metadata", map(
          lit("lang"), col("lang"),
          lit(""), lit("dropped"),
          lit("source"), col("source")))
      graft.ChunkSchema.sanitizeMetadata(withMeta)
        .select(col("doc_id"),
          concat_ws(",", array_sort(map_keys(col("metadata")))).as("meta_keys"),
          element_at(col("metadata"), "lang").as("meta_lang"))
        .orderBy(col("doc_id"))
    },
    // A6: multi-keyword concat — query-prep semantics (app.py:373,402)
    // applied columnar for coverage.
    "a6_keyword_concat" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), concat_ws(" ", col("lang"), col("source")).as("query_string"))
        .orderBy(col("doc_id"))
    },
    // A7 document-content filter: Chroma's `where_document` wire shape
    // ({"$contains"/"$not_contains"}) over the text column — an ordinary
    // pushdown-able predicate, same as the metadata where-DSL
    "a7_where_doc" -> { (s, dir) =>
      val where = graft.functions.WhereFilter.parseDocument(
        """{"$and": [{"$contains": "spark"}, {"$not_contains": "data"}]}""", "text")
      Tables.documents(s, dir)
        .filter(where)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "c1_collection_scan" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,
    "c2_distinct_docs" ->
      s"""WITH c AS ($chunksCte)
         |SELECT doc_id, min_by(content, chunk_index) AS first_chunk,
         |       count(*) AS chunk_count
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c3_chunks_by_doc" ->
      s"""WITH c AS ($chunksCte)
         |SELECT doc_id, string_agg(content, '|' ORDER BY chunk_index) AS chunks_concat,
         |       count(*) AS chunk_count
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "b9_dup_guard" ->
      """SELECT d.doc_id, d.source FROM documents d
        |WHERE d.lang = 'fr'
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.doc_id % 3 = 0 AND c.doc_id = d.doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "b9_dup_guard_bloom" ->
      """SELECT d.doc_id, d.source FROM documents d
        |WHERE d.lang = 'fr'
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.doc_id % 3 = 0 AND c.doc_id = d.doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "b11_dual_write" ->
      """WITH base AS (SELECT doc_id, source FROM documents WHERE doc_id < 50)
        |SELECT doc_id, source, 'strategy_documents' AS original_collection,
        |       'strategy_documents' AS collection FROM base
        |UNION ALL
        |SELECT doc_id, source, 'strategy_documents', 'master' FROM base
        |ORDER BY collection, doc_id""".stripMargin,
    "d1_delete_cascade" ->
      s"""$mutationCorpusCte
         |SELECT * FROM corpus
         |WHERE NOT (doc_id = 7 AND collection IN ('strategy_documents', 'master'))
         |ORDER BY collection, doc_id""".stripMargin,
    "d3_delete_report" ->
      s"""$mutationCorpusCte
         |SELECT collection, count(*) AS deleted_rows FROM corpus
         |WHERE doc_id = 7 GROUP BY collection ORDER BY collection""".stripMargin,
    "a6_keyword_concat" ->
      """SELECT doc_id, concat_ws(' ', lang, source) AS query_string
        |FROM documents ORDER BY doc_id""".stripMargin,
    "b10_dup_guard_coll" ->
      """SELECT d.doc_id, d.source FROM documents d
        |WHERE d.doc_id >= 400
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.lang = 'de' AND c.doc_id = d.doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "b7_meta_sanitize" ->
      """SELECT doc_id, 'lang,source' AS meta_keys, lang AS meta_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a7_where_doc" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE contains(text, 'spark') AND NOT contains(text, 'data')
        |ORDER BY doc_id""".stripMargin
  )
}
