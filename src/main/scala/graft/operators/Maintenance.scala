package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance utilities — the file-management side of the 100 TB
  * story. Streaming ingest (foreachBatch appends) and per-collection
  * dual-writes accumulate small files; scan throughput collapses when
  * file count dominates (every file = one task + one footer read).
  */
object Maintenance {

  /** Restore a table whose compaction swap was interrupted: if `path`
    * is missing but `<path>__old` exists (the crash window between the
    * two renames in [[compactParquet]]), rename the original back.
    * Returns true when a restore happened. Call at startup for any
    * compaction-managed table, or rely on [[compactParquet]] calling it. */
  def restoreIfInterrupted(spark: SparkSession, path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldPath = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    if (!fs.exists(hPath) && fs.exists(oldPath)) fs.rename(oldPath, hPath)
    else false
  }

  /** Compact a parquet directory to ~targetBytes files: size the
    * partition count from actual on-disk bytes, rewrite, swap. The
    * rewrite preserves rows exactly (count-checked before the swap) and
    * the swap is rename-original-aside first, so any failure leaves the
    * original either in place or restorable at `<path>__old` (an
    * interrupted swap is auto-restored on the next call, or explicitly
    * via [[restoreIfInterrupted]]). A hive-partitioned layout
    * (collection=... dirs) is preserved.
    *
    * Concurrency contract: SINGLE WRITER, and no concurrent readers
    * during the swap — between the two renames the table path briefly
    * does not exist. Readers holding an already-planned DataFrame are
    * unaffected only until their next file listing. */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): Long = {
    restoreIfInterrupted(spark, path)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    // preserve hive-style partition columns (dirs named col=value)
    val partitionCols = fs.listStatus(hPath).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.contains("=")).map(_.split("=", 2)(0)).distinct

    val df = spark.read.parquet(path)
    val expected = df.count()
    val tmp = path.stripSuffix("/") + "__compacting"
    val writer = df.repartition(nFiles).write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp)

    val actual = spark.read.parquet(tmp).count()
    require(actual == expected,
      s"compaction row mismatch: $expected before, $actual after — aborting swap")

    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val oldPath = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    if (fs.exists(oldPath)) fs.delete(oldPath, true)
    require(fs.rename(hPath, oldPath),
      s"compaction: could not move original aside ($path -> $oldPath); original untouched")
    if (!fs.rename(tmpPath, hPath)) {
      fs.rename(oldPath, hPath) // restore
      throw new IllegalStateException(
        s"compaction: swap failed for $path; original restored, rewrite left at $tmp")
    }
    fs.delete(oldPath, true)
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

  /** Corpus version diff — the audit step between two snapshots of a
    * training corpus: which docs were added, removed, or edited. Rows
    * are compared by content fingerprint, so the join ships (id, 16-byte
    * md5) only — at 100 TB this is ONE shuffle of slim fingerprint rows
    * on the doc id, never the payloads. Returns one row per doc id in
    * either snapshot with status added/removed/changed/unchanged.
    *
    * Contract: ids must be unique WITHIN each snapshot (dedup upstream —
    * [[graft.operators.Dedup.dropDuplicates]]); duplicate ids fan out
    * through the join and inflate the stats. Presence is tracked with
    * explicit markers and the change test is null-safe, so a null text
    * (a legitimate state for JSONL-read docs with a missing field) is a
    * comparable value, not a fake join miss. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol), md5(col(textCol).cast("binary")).as("old_fp"),
      lit(true).as("in_old"))
    val n = newDocs.select(col(idCol), md5(col(textCol).cast("binary")).as("new_fp"),
      lit(true).as("in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(!(col("old_fp") <=> col("new_fp")), "changed")
          .otherwise("unchanged"))
      .select(col(idCol), col("status"))
  }

  /** Roll-up of [[corpusDiff]]: doc counts per status. */
  def corpusDiffStats(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    corpusDiff(oldDocs, newDocs, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
