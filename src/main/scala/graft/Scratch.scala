package graft
import org.apache.spark.sql.SparkSession
// dev scratch: run a subset of SparkEntry.queries (args: sfDir outDir names...)
// With SPARK_GRAFT_COUNT_ONLY=1, skip the parquet dump and print result
// ROW COUNTS + time instead (the pair-output exemption evidence for the
// scale spot-bench: quadratic-output queries report their output size).
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val countOnly = sys.env.get("SPARK_GRAFT_COUNT_ONLY").contains("1")
    // SPARK_GRAFT_EXPLAIN=1: print each query's formatted physical plan
    // instead of executing it (the iterate-on-the-plan loop)
    val explainOnly = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val t0 = System.nanoTime()
      if (explainOnly) {
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      } else if (countOnly) {
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[scratch] $n: $c rows, ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } else {
        SparkEntry.queries(n)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$n")
        println(f"[scratch] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    if (!countOnly && !explainOnly) Verify.writeOracleJson(outDir)
    spark.stop()
  }
}
