package graft
import org.apache.spark.sql.SparkSession
// dev scratch: run a subset of SparkEntry.queries (args: sfDir outDir names...)
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"[scratch] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Verify.writeOracleJson(outDir)
    spark.stop()
  }
}
