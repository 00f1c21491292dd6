package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance utilities — the file-management side of the 100 TB
  * story. Streaming ingest (foreachBatch appends) and per-collection
  * dual-writes accumulate small files; scan throughput collapses when
  * file count dominates (every file = one task + one footer read).
  */
object Maintenance {

  /** Compact a parquet directory to ~targetBytes files: size the
    * partition count from actual on-disk bytes, rewrite, swap. The
    * rewrite preserves rows exactly (count-checked before the swap —
    * failed rewrites never destroy the original). */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(path)
    val expected = df.count()
    val tmp = path.stripSuffix("/") + "__compacting"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)

    val actual = spark.read.parquet(tmp).count()
    require(actual == expected,
      s"compaction row mismatch: $expected before, $actual after — aborting swap")
    fs.delete(hPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), hPath)
    expected
  }

  /** File-count + size profile of a parquet table (the signal that
    * triggers compaction). */
  def fileStats(spark: SparkSession, path: String): (Long, Long) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hPath, true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { files += 1; bytes += f.getLen }
    }
    (files, bytes)
  }
}
