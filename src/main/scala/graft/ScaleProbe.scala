package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** Skew-profiled scale probe for the incremental near-dup path — the
  * SCALEBENCH.md instrument for the one named 100× residual: the
  * verify-stage single-task memory concentration under twin-replicated
  * corpora. Runs `Dedup.jaccardPairsPrefixIncremental` on a derived
  * scale dir (see [[ScaleUp]]) with the salt knob from the CLI, counts
  * the output (pair-output exemption: no parquet materialization), and
  * prints a per-stage task-skew profile — max vs median shuffle-read /
  * input bytes and peak execution memory — so "did the salt spread the
  * hot key" is answered by measured task distribution, not by load
  * averages.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> [saltBuckets]
  * (SPARK_GRAFT_CPUS sizes local[] and shuffle partitions, default 32;
  * SPARK_DRIVER_MEM sizes the JVM via build.sbt.)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val salt = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // zstd halves shuffle-file size vs the lz4 default: every shuffle
      // write of a single probe job is retained until the job ends, and
      // the adversarial twin fixture's candidate volume makes DISK the
      // binding resource on this box (a real cluster sizes scratch per
      // executor; the single-node probe must live within one disk)
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stageId -> per-task (shuffleReadBytes, inputBytes, peakExecMem)
    val taskStats = mutable.Map[Int, mutable.ArrayBuffer[(Long, Long, Long)]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) taskStats.synchronized {
          taskStats.getOrElseUpdate(e.stageId, mutable.ArrayBuffer()) +=
            ((m.shuffleReadMetrics.totalBytesRead, m.inputMetrics.bytesRead,
              m.peakExecutionMemory))
        }
      }
    })

    val docs = Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val pairs = operators.Dedup.jaccardPairsPrefixIncremental(
      docs.where(col("doc_id") % 10 === 0),
      docs.where(col("doc_id") % 10 =!= 0),
      "doc_id", "text", "lang", 0.8, saltBuckets = salt).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[scaleprobe] dir=$sfDir salt=$salt pairs=$pairs time=$secs%.1f s")

    def mb(x: Long) = x / 1e6
    def med(xs: Seq[Long]): Long = { val s = xs.sorted; s(s.size / 2) }
    val rows = taskStats.synchronized { taskStats.toSeq }
    rows.filter(_._2.nonEmpty).sortBy(-_._2.map(_._1).max).take(12).foreach {
      case (sid, ts) =>
        val sr = ts.map(_._1).toSeq; val in = ts.map(_._2).toSeq; val pm = ts.map(_._3).toSeq
        println(f"[stage $sid%4d] tasks=${ts.size}%4d " +
          f"shufRead max=${mb(sr.max)}%9.1f MB med=${mb(med(sr))}%9.1f MB " +
          f"input max=${mb(in.max)}%9.1f MB " +
          f"peakMem max=${mb(pm.max)}%9.1f MB med=${mb(med(pm))}%9.1f MB")
    }
    spark.stop()
  }
}
