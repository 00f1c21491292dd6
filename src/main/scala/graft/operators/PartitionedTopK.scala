package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch multi-query exact top-k with per-partition heaps — the scale
  * path for `VectorSearch.batchTopK` (SURVEY §4.3.2).
  *
  * The window-function formulation shuffles |corpus| × |queries| scored
  * rows to rank them. This operator instead keeps a k-heap PER QUERY
  * inside every input partition (`mapPartitions` — genuine imperative
  * per-partition state, the one place SURVEY §7.3 sanctions RDD-level
  * code) and emits only `partitions × queries × k` rows into the final
  * ranking. At 1000 executors × 8 queries × k=5 that is a ~40k-row
  * shuffle regardless of corpus size — the same per-partition-heap +
  * driver-merge shape Spark itself uses for TakeOrderedAndProject.
  *
  * Result is EXACT and bit-identical to the window formulation: heap
  * ordering is (dist, id) so ties resolve identically.
  */
object PartitionedTopK {

  /** queries: driver-side (id, vector) pairs — the broadcast side.
    * Returns (query_id, idCol, dist, rn) ranked 1..k per query.
    * The id column may be long, int or string (e.g. ChunkSchema's
    * string `chunk_id`); its type is carried through to the result. */
  def batchTopK(corpus: DataFrame, queries: Seq[(Long, Array[Float])], k: Int,
                embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = corpus.sparkSession
    val sc = spark.sparkContext
    val bq = sc.broadcast(queries.toArray)

    // tie-break ordering on the id, matching the final window rank's
    // semantics for that type (strings compare as UTF-8 bytes, the same
    // binary order Spark's UTF8String sort uses — Java String.compareTo
    // would disagree on supplementary characters)
    val idType = corpus.schema(idCol).dataType
    val idOrd: Ordering[Any] = idType match {
      case LongType    => Ordering.by((x: Any) => x.asInstanceOf[Long])
      case IntegerType => Ordering.by((x: Any) => x.asInstanceOf[Int])
      case StringType  => new Ordering[Any] {
        // code-point order == UTF-8 byte order (UTF-8 preserves code
        // point ordering), computed without allocating byte arrays —
        // this comparator runs inside the per-row heap loop on distance
        // ties. Plain String.compareTo (UTF-16 code units) would
        // disagree when supplementary characters meet chars >= U+E000.
        def compare(a: Any, b: Any): Int = {
          val x = a.asInstanceOf[String]
          val y = b.asInstanceOf[String]
          var i = 0
          var j = 0
          while (i < x.length && j < y.length) {
            val cx = x.codePointAt(i)
            val cy = y.codePointAt(j)
            if (cx != cy) return Integer.compare(cx, cy)
            i += Character.charCount(cx)
            j += Character.charCount(cy)
          }
          Integer.compare(x.length - i, y.length - j)
        }
      }
      case other => throw new IllegalArgumentException(
        s"batchTopK: id column '$idCol' has unsupported type $other " +
          "(supported: long, int, string)")
    }

    // (dist, id) max-heap of size k per query: head = WORST kept entry,
    // so a better candidate evicts it in O(log k).
    val ord: Ordering[(Float, Any)] =
      Ordering.Tuple2(Ordering.Float.TotalOrdering, idOrd)

    // null rows are excluded up front (a null embedding has no distance;
    // the window formulation ranks them last via NULLS LAST — beyond-k
    // either way), and dimension mismatch fails loudly exactly like the
    // codegen kernels (VectorExpressions.checkDims)
    val partial = corpus.select(col(idCol), col(embCol))
      .where(col(idCol).isNotNull && col(embCol).isNotNull)
      .rdd.mapPartitions { rows =>
      val qs = bq.value
      val heaps = Array.fill(qs.length)(mutable.PriorityQueue.empty[(Float, Any)](ord))
      for (r <- rows) {
        val id = r.get(0)
        val v = r.getSeq[Float](1)
        var qi = 0
        while (qi < qs.length) {
          val q = qs(qi)._2
          if (v.length != q.length) throw new IllegalArgumentException(
            s"batchTopK: vector dimensions differ (${v.length} vs ${q.length})")
          var acc = 0.0f
          var d = 0
          val n = v.length
          while (d < n) { val x = v(d) - q(d); acc += x * x; d += 1 }
          val dist = math.sqrt(acc.toDouble).toFloat
          val h = heaps(qi)
          if (h.size < k) h.enqueue((dist, id))
          else if (ord.lt((dist, id), h.head)) { h.dequeue(); h.enqueue((dist, id)) }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (dist, id) => Row(qs(qi)._1, id, dist.toDouble) }
      }
    }

    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField(idCol, idType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val reduced = spark.createDataFrame(partial, schema)

    // final exact rank over the tiny reduced set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist"), col(idCol))
    reduced.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy(col("query_id"), col("rn"))
  }
}
