package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sharding}

/** Sequence-packing spec: budget safety, oversize handling, shard
  * isolation, partitioning-independence, and an exact next-fit replay
  * on seeded random token counts. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 100L

  private def pack(rows: Seq[(Long, Long)], nShards: Int = 4) =
    Packing.packDocs(rows.toDF("doc_id", "n_tok"), "doc_id", "n_tok",
        nShards, budget)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  test("multi-doc packs never exceed the budget; oversize docs pack alone") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, if (rnd.nextInt(10) == 0) 150L + rnd.nextInt(100) else 1L + rnd.nextInt(60)))
    val byPack = pack(rows).groupBy(r => (r._2, r._3)).values
    byPack.foreach { members =>
      val total = members.map(_._5).sum
      if (members.length > 1) assert(total <= budget,
        s"pack of ${members.length} docs holds $total tokens > $budget")
      else assert(total > budget - 60 || total <= budget) // single doc: any size
    }
    // every oversize doc is alone in its pack
    val oversize = pack(rows).filter(_._5 > budget)
    val packSizes = pack(rows).groupBy(r => (r._2, r._3)).view.mapValues(_.length).toMap
    oversize.foreach(r => assert(packSizes((r._2, r._3)) === 1))
  }

  test("pack ids and positions are dense and shard-local") {
    val rows = (1L to 200L).map(i => (i, 30L))
    val out = pack(rows)
    out.groupBy(_._2).foreach { case (_, members) =>
      val packIds = members.map(_._3).distinct.sorted
      assert(packIds === (1L to packIds.length).toSeq, "dense pack ids per shard")
      members.groupBy(_._3).foreach { case (_, inPack) =>
        assert(inPack.map(_._4).sorted === (1L to inPack.length).toSeq,
          "dense 1-based positions within a pack")
      }
    }
  }

  test("assignment is independent of input partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i => (i, 1L + rnd.nextInt(80)))
    val a = Packing.packDocs(rows.toDF("doc_id", "n_tok"), "doc_id", "n_tok", 4, budget)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Packing.packDocs(rows.toDF("doc_id", "n_tok").repartition(17),
        "doc_id", "n_tok", 4, budget)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("zero-token doc cannot pull an oversize doc into its pack") {
    // docs share a shard only if md5-assigned together; force one shard
    val out = Packing.packDocs(
        Seq((1L, 0L), (2L, 150L), (3L, 10L)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", nShards = 1, budget = budget)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val packOf = out.map(r => r._1 -> r._3).toMap
    assert(packOf(2L) !== packOf(1L), "oversize doc must open its own pack")
    assert(packOf(3L) !== packOf(2L), "doc after an oversize pack starts fresh")
  }

  test("matches an exact driver-side next-fit replay") {
    val rnd = new scala.util.Random(23)
    val rows = (1L to 400L).map(i => (i, 1L + rnd.nextInt(120)))
    val shardOf = Sharding.assignShards(rows.toDF("doc_id", "n_tok"), "doc_id", 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val expected = rows.groupBy(r => shardOf(r._1)).flatMap { case (shard, docs) =>
      var packId = 0L; var pos = 0L; var cum = 0L
      docs.sortBy(_._1).map { case (id, n) =>
        if (packId == 0 || cum + n > budget) { packId += 1; pos = 0; cum = 0 }
        pos += 1; cum += n
        (id, shard, packId, pos, n)
      }
    }.toSeq.sortBy(_._1)
    assert(pack(rows).toSeq === expected)
  }

  test("renderPacks: pack_pos order, separator placement, budget-bounded rows") {
    val docs = Seq((1L, "alpha", 10L), (2L, "bravo", 10L), (3L, "charlie", 10L),
      (4L, "delta", 95L), (5L, "echo", 10L))
      .toDF("doc_id", "text", "n_tok")
    val packed = Packing.packDocs(docs, "doc_id", "n_tok", nShards = 1,
      budget = 100L)
    val rendered = Packing.renderPacks(docs, packed, "doc_id", "text", sep = "#")
      .orderBy($"shard", $"pack_id")
      .as[(Long, Long, Long, Long, String)].collect()
    // every pack's text is its members joined in pack_pos order
    val assign = packed.as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(r => (r._2, r._3))
    val texts = docs.as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    for ((shard, packId, nDocs, packTokens, packText) <- rendered) {
      val members = assign((shard, packId)).sortBy(_._4)
      assert(nDocs === members.length)
      assert(packTokens === members.map(_._5).sum)
      assert(packText === members.map(m => texts(m._1)).mkString("#"),
        s"pack ($shard,$packId) rendered out of order")
    }
    // the oversize doc renders alone, no separator
    val solo = rendered.find(_._5 == "delta")
    assert(solo.isDefined && solo.get._3 === 1L)
  }

  test("packStats fill ratio is <= 1 and exact for multi-doc packs") {
    val rows = (1L to 100L).map(i => (i, 40L))
    val stats = Packing.packStats(rows.toDF("doc_id", "n_tok"), "doc_id", "n_tok", 2, budget)
      .as[(Long, Long, Long, Long, Double)].collect()
    stats.foreach { case (_, _, nDocs, tokens, fill) =>
      assert(fill <= 1.0)
      if (tokens <= budget) assert(fill === tokens.toDouble / budget)
    }
  }
}
