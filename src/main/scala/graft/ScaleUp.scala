package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger scale factor from the driver-generated fixtures by
  * key-remapped replication, so the whole gate + bench can run at 10×
  * (≈sf1) even though the driver only materializes up to sf0.1.
  *
  * Design (why replication, not synthesis): the task contract says to
  * use the driver's parquet as inputs, and the point of the sf1 run is
  * SCALE validation — shuffle volume, partition counts, candidate
  * growth — not new data semantics. Each replica i keeps every
  * intra-replica relationship intact by shifting every key family by
  * i × stride, where stride = max(key)+1 of the base table:
  * orders.o_custkey moves with customer.c_custkey, lineitem's three FKs
  * move with their parents, events.user_id moves with its own stride.
  * Fixed-cardinality dimensions (region, nation) are NOT replicated —
  * TPC-H holds them constant at every SF, and replicating them would
  * break the FK range instead of scaling it.
  *
  * Payloads (text, embeddings, timestamps) are copied verbatim. The
  * honest consequence, documented where it bites: pair-producing
  * near-dup queries see each document gain (factor−1) exact twins, so
  * their OUTPUT grows ~factor² while their candidate-generation plans
  * grow ~factor — exactly the adversarial-duplication stress a crawl
  * corpus produces, and the right thing to measure.
  *
  * Usage: runMain graft.ScaleUp [baseDir] [factor] [outDir]
  */
object ScaleUp {

  /** Replicate `df` `factor` times, shifting each column in `shift` by
    * replica × its stride. One narrow pass: explode a literal replica
    * array (no join, no shuffle); strides are computed from the base
    * table once (a cheap max over the key column). */
  def replicate(df: DataFrame, factor: Int, shift: Map[String, Long]): DataFrame = {
    val withRep = df.withColumn("__rep", explode(lit((0 until factor).toArray)))
    val shifted = shift.foldLeft(withRep) { case (d, (colName, stride)) =>
      d.withColumn(colName, col(colName) + col("__rep").cast("long") * lit(stride))
    }
    shifted.drop("__rep")
  }

  private def stride(df: DataFrame, key: String): Long = {
    // max over an empty table is null — fail with context, not an NPE
    val m = df.agg(max(col(key).cast("long"))).head.get(0)
    require(m != null, s"stride: base table is empty (key '$key')")
    m.asInstanceOf[Long] + 1L
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor  = if (args.length > 1) args(1).toInt else 10
    val outDir  = if (args.length > 2) args(2) else "target/sf1-derived"
    val cpus    = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-scaleup")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // Dimensions: constant at every SF (TPC-H semantics).
    write(Tables.region(spark, baseDir), "region", 1)
    write(Tables.nation(spark, baseDir), "nation", 1)

    val customer = Tables.customer(spark, baseDir)
    val orders   = Tables.orders(spark, baseDir)
    val part     = Tables.part(spark, baseDir)
    val supplier = Tables.supplier(spark, baseDir)
    val docs     = Tables.documents(spark, baseDir)
    val embs     = Tables.embeddings(spark, baseDir)
    val events   = Tables.events(spark, baseDir) // ts read as epoch-ns long

    val custS  = stride(customer, "c_custkey")
    val orderS = stride(orders, "o_orderkey")
    val partS  = stride(part, "p_partkey")
    val suppS  = stride(supplier, "s_suppkey")
    val docS   = stride(docs, "doc_id")
    val vecS   = stride(embs, "vec_id")
    val eventS = stride(events, "event_id")
    val userS  = stride(events, "user_id")

    write(replicate(customer, factor, Map("c_custkey" -> custS)), "customer", 4)
    write(replicate(supplier, factor, Map("s_suppkey" -> suppS)), "supplier", 1)
    write(replicate(part, factor, Map("p_partkey" -> partS)), "part", 4)
    write(replicate(orders, factor,
      Map("o_orderkey" -> orderS, "o_custkey" -> custS)), "orders", 8)
    write(replicate(Tables.lineitem(spark, baseDir), factor,
      Map("l_orderkey" -> orderS, "l_partkey" -> partS, "l_suppkey" -> suppS)),
      "lineitem", 32)
    write(replicate(events, factor,
      Map("event_id" -> eventS, "user_id" -> userS)), "events", 16)
    write(replicate(docs, factor, Map("doc_id" -> docS)), "documents", 8)
    write(replicate(embs, factor, Map("vec_id" -> vecS)), "embeddings", 4)

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => t -> spark.read.parquet(s"$outDir/$t.parquet").count())
    counts.foreach { case (t, n) => println(s"[scaleup] $t: $n rows") }
    spark.stop()
  }
}
