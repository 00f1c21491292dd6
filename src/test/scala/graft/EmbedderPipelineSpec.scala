package graft

import org.apache.spark.sql.functions._

import graft.functions.HashingEmbedder
import graft.operators.{ChunkStore, TextChunker, VectorSearch}

/** End-to-end ingest→search spec (SURVEY §5.4): chunk documents, embed
  * with the deterministic hashing embedder, dual-write into collections,
  * then retrieve a chunk of the source document from a query drawn from
  * its own text. */
class EmbedderPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("embedder: deterministic, L2-normalized, similarity-preserving") {
    val a1 = HashingEmbedder.embed("the quick brown fox", 64)
    val a2 = HashingEmbedder.embed("the quick brown fox", 64)
    assert(a1.toSeq === a2.toSeq)
    val norm = math.sqrt(a1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    def cos(x: Array[Float], y: Array[Float]) = x.zip(y).map { case (p, q) => p * q }.sum
    val near = HashingEmbedder.embed("the quick brown foxes", 64)
    val far = HashingEmbedder.embed("zzz completely unrelated wording qqq", 64)
    assert(cos(a1, near) > cos(a1, far))
  }

  test("ingest -> embed -> dual-write -> search returns source document") {
    val docs = Tables.documents(spark, sfDir).orderBy("doc_id").limit(100)
    val chunks = TextChunker.chunkDocuments(docs, chunkSize = 120, overlap = 20)
    val emb = HashingEmbedder.withEmbedding(chunks, "content", 64)
    val store = ChunkStore.dualWrite(emb, "strategy_documents")

    // dual-write invariant: every row exists in target AND master
    val perColl = store.groupBy($"collection").count().as[(String, Long)].collect().toMap
    assert(perColl("master") === perColl("strategy_documents"))

    // query: a verbatim chunk of doc 17 → its own chunk must rank first
    val probe = store.filter($"doc_id" === 17 && $"collection" === "master")
      .orderBy($"chunk_index").select($"content").head().getString(0)
    val qv = HashingEmbedder.embed(probe, 64).toSeq
    val top = VectorSearch.topKWithScore(
      store.filter($"collection" === "master"), qv, 3,
      VectorSearch.Cosine, None, "embedding", "doc_id")
    val hit = top.select($"doc_id").as[Long].head()
    assert(hit === 17L)
  }

  test("Embedder trait: per-partition factory path equals the column path") {
    import graft.functions.{Embedders, HashingEmbedder => HE}
    val docs = Tables.documents(spark, sfDir).orderBy("doc_id").limit(30).select($"doc_id", $"text")
    val viaUdf = HE.withEmbedding(docs, "text", 64)
      .select($"doc_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val viaPartitions = Embedders.embedDistributed(docs, "text", () => HE.asEmbedder(64))
      .select($"doc_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    assert(viaUdf === viaPartitions)
  }

  test("NeuralEmbedder: batched inference == per-row inference, bit-identical") {
    import graft.functions.NeuralEmbedder
    val e = new NeuralEmbedder(dim = 64)
    val texts = Seq("the quick brown fox", "잘 부탁드립니다", "", "one", "two words here")
    val batched = e.embedBatch(texts.iterator).toSeq
    val perRow = texts.map(t => new NeuralEmbedder(dim = 64).embed(t))
    for ((b, p) <- batched.zip(perRow)) assert(b.toSeq === p.toSeq)
    // L2-normalized, deterministic across instances
    for (v <- batched.filter(_.exists(_ != 0.0f)))
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    // similarity structure: shared tokens → closer than disjoint
    def cos(x: Array[Float], y: Array[Float]) = x.zip(y).map { case (a, b) => a * b }.sum
    val q = e.embed("the quick brown fox jumps")
    assert(cos(q, batched(0)) > cos(q, batched(1)))
  }

  test("NeuralEmbedder: per-partition session init + real batches through the seam") {
    import graft.functions.{Embedders, NeuralEmbedder}
    val docs = Tables.documents(spark, sfDir).orderBy("doc_id").limit(200)
      .select($"doc_id", $"text").repartition(4).cache()
    try {
      docs.count() // materialize so the embed job sees exactly 4 partitions
      NeuralEmbedder.constructions.set(0)
      NeuralEmbedder.maxBatchSeen.set(0)
      val out = Embedders.embedDistributed(docs, "text",
        () => new NeuralEmbedder(dim = 64), batchSize = 64)
      assert(out.select($"embedding").as[Seq[Float]].collect().forall(_.length == 64))
      // the "model load" ran once per partition — not once per row/batch
      // (>= not ===: a task retry or speculative attempt legitimately
      // re-runs mapPartitions and constructs again)
      val inits = NeuralEmbedder.constructions.get()
      assert(inits >= 4 && inits <= 8,
        s"expected ~4 per-partition inits (4 partitions), got $inits")
      // and inference really was batched (50 rows/partition → batches of 64→50)
      assert(NeuralEmbedder.maxBatchSeen.get() === 50,
        s"expected a full 50-row batch, got ${NeuralEmbedder.maxBatchSeen.get()}")
    } finally docs.unpersist()
  }

  test("typed Dataset[Chunk] round trip through the canonical schema") {
    import graft.ChunkSchema
    import graft.ChunkSchema.Chunk
    val chunks = Seq(
      Chunk("c1", "d1", "doc.txt", 0, "master", "strategy_documents",
        Some("upload"), "hello world", Map("k" -> "v"),
        graft.functions.HashingEmbedder.embed("hello world", 64)),
      Chunk("c2", "d1", "doc.txt", 1, "master", "strategy_documents",
        None, "second chunk", Map.empty,
        graft.functions.HashingEmbedder.embed("second chunk", 64)))
    val ds = spark.createDataset(chunks)(ChunkSchema.chunkEncoder)
    // dataframe schema field names line up with the declared StructType
    assert(ds.toDF().schema.fieldNames.toSeq === ChunkSchema.schema.fieldNames.toSeq)
    val back = ds.as[Chunk](ChunkSchema.chunkEncoder).collect()
    assert(back.map(_.chunk_id).toSet === Set("c1", "c2"))
    assert(back.find(_.chunk_id == "c2").get.source.isEmpty)
  }

  test("unknown collection is rejected (get_vector_store ValueError semantics)") {
    import graft.operators.ChunkStore
    assert(ChunkStore.requireCollection("master") === "master")
    intercept[IllegalArgumentException] {
      ChunkStore.requireCollection("nonexistent_documents")
    }
  }

  test("delete cascade removes doc from both collections") {
    val docs = Tables.documents(spark, sfDir).orderBy("doc_id").limit(20)
    val store = ChunkStore.dualWrite(
      TextChunker.chunkDocuments(docs, chunkSize = 120, overlap = 20), "compliance_documents")
    val after = ChunkStore.deleteDocument(store, 5L,
      Some(Seq("compliance_documents", "master")))
    assert(after.filter($"doc_id" === 5L).isEmpty)
    assert(ChunkStore.existsGlobally(store, "doc_id", 5L))
    assert(!ChunkStore.existsGlobally(after, "doc_id", 5L))
  }
}
