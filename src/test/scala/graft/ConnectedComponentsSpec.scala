package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Connected-components spec: topology coverage (chain/cycle/star — the
  * shapes where pair-set thresholding genuinely chains), input
  * robustness, O(log n) round convergence on the worst case for naive
  * min-propagation, and a seeded random cross-check against an exact
  * union-find. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("id_a", "id_b"), maxIter = maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain collapses to one component (worst case for min propagation)") {
    val chain = (1L until 20L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.keySet === (1L to 20L).toSet)
    assert(labels.values.toSet === Set(1L))
  }

  test("chain of 64 converges in O(log n) rounds, not O(n)") {
    // naive min-label propagation needs ~64 rounds here; large/small-star
    // needs ~2·log2(64)+slack. maxIter=14 proves the logarithmic bound
    // (convergence failure raises).
    val chain = (1L until 64L).map(i => (i, i + 1))
    val labels = cc(chain, maxIter = 14)
    assert(labels.values.toSet === Set(1L))
  }

  test("disjoint components get distinct minimum labels") {
    val edges = Seq((3L, 4L), (4L, 5L), (10L, 11L), (20L, 21L), (21L, 22L))
    val labels = cc(edges)
    assert(labels === Map(3L -> 3L, 4L -> 3L, 5L -> 3L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("cycle, star and clique all label to the component minimum") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(cc(cycle).values.toSet === Set(1L))
    val star = Seq((7L, 2L), (7L, 9L), (7L, 4L), (7L, 11L))
    assert(cc(star) === Map(2L -> 2L, 4L -> 2L, 7L -> 2L, 9L -> 2L, 11L -> 2L))
    val clique = for (a <- 5L to 8L; b <- (a + 1) to 8L) yield (a, b)
    assert(cc(clique).values.toSet === Set(5L))
  }

  test("reversed / duplicate / self-loop edges do not change the answer") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 2L), (3L, 2L), (2L, 3L), (1L, 1L))
    assert(cc(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("non-numeric orderable ids work (string doc names)") {
    val labels = Dedup.connectedComponents(
        Seq(("b.txt", "a.txt"), ("b.txt", "c.txt"), ("x.txt", "y.txt"))
          .toDF("id_a", "id_b"))
      .as[(String, String)].collect().toMap
    assert(labels === Map("a.txt" -> "a.txt", "b.txt" -> "a.txt",
      "c.txt" -> "a.txt", "x.txt" -> "x.txt", "y.txt" -> "x.txt"))
  }

  test("seeded random graph matches exact union-find") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // exact reference: path-compressed union-find on the driver
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expected = nodes.map { id =>
      val root = find(id.toInt)
      id -> nodes.filter(o => find(o.toInt) == root).min
    }.toMap
    assert(cc(edges) === expected)
  }

  test("celebrity node: 20k-leaf star completes without collecting neighbors") {
    // the two-phase-min construction must handle one node with huge
    // degree as shuffle volume, not driver/executor memory — this would
    // OOM a collect_list formulation long before 20k
    val star = (1L to 20000L).map(i => (0L, i))
    val labels = Dedup.connectedComponents(star.toDF("id_a", "id_b"))
    assert(labels.count() === 20001)
    assert(labels.select("component").distinct().as[Long].collect().toSeq === Seq(0L))
  }

  test("per-endpoint min PARTIAL-aggregates (celebrity endpoint is no straggler)") {
    // the round's min-per-endpoint must be a two-phase HashAggregate
    // (partial_min before the exchange, min after) — a window-min
    // formulation computes the same value but funnels a celebrity
    // node's entire neighborhood through ONE task. Assert the physical
    // plan, not just the answer.
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("u", "v")
    val plan = Dedup.ccRound(edges).queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"expected partial_min HashAggregate in round plan, got:\n$plan")
    assert(!plan.contains("Window"),
      s"round plan must not contain a Window operator:\n$plan")
  }

  test("empty pair set: components are empty, keepCanonical is identity") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
    val docs = (1L to 5L).toDF("doc_id")
    val kept = Dedup.keepCanonical(docs, empty, "doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept === (1L to 5L).toSeq)
  }

  test("keepCanonical keeps min-id per component plus untouched docs") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonical(docs, pairs, "doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L, 5L, 7L, 8L))
  }

  test("keepCanonicalBy keeps the best-scored member; ties break to min id") {
    // component {1,2,3}: scores 5,9,9 -> winner 2 (9 ties, min id wins);
    // component {5,6}: scores 1,4 -> winner 6 (NOT the min id);
    // 4,7,8 untouched
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 0L), (5L, 1L),
      (6L, 4L), (7L, 2L), (8L, 3L)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonicalBy(docs, pairs, "doc_id", "q")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 4L, 6L, 7L, 8L))
    // empty pairs: identity
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.keepCanonicalBy(docs, empty, "doc_id", "q").count() === 8L)
  }

  test("keepCanonicalBy works with STRING ids (no numeric-negation tie-break)") {
    // content-hash-style ids; component {a,b}: b wins on score;
    // component {c,d}: scores tie -> lexicographically smaller id wins
    val docs = Seq(("doc_a", 1L), ("doc_b", 7L), ("doc_c", 5L),
      ("doc_d", 5L), ("doc_e", 0L)).toDF("doc_id", "q")
    val pairs = Seq(("doc_a", "doc_b"), ("doc_c", "doc_d")).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonicalBy(docs, pairs, "doc_id", "q")
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(kept === Seq("doc_b", "doc_c", "doc_e"))
  }

  test("keepCanonicalBy: an all-null-score component still keeps one canonical") {
    // component {1,2}: both scores null -> min-id fallback, NOT deletion;
    // component {3,4}: null vs 5 -> the scored member wins
    val docs = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]),
      (3L, Option.empty[Long]), (4L, Some(5L)), (5L, Some(1L)))
      .toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonicalBy(docs, pairs, "doc_id", "q")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L, 5L))
  }
}
