package graft

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the Ed-Join bag-distance filter (r16-opt): the
  * box has noisy neighbors (load average 4-5 while "idle"), so
  * back-to-back full-bench windows swing 2-3× and cannot attribute a
  * kernel change. This probe alternates the two shapes inside ONE
  * session — bag filter ON / OFF per round — releasing caches between
  * runs, and reports per-round times plus medians, so the delta is the
  * filter's and the ambient noise hits both arms alike. Output-count
  * parity is asserted every round (the filter is lossless or it is
  * broken).
  *
  * Usage: runMain graft.EdJoinProbe <sfDir> [rounds] [tau]
  */
object EdJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 4
    val tau = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def run(bag: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = operators.EdJoin
        .editDistanceJoinImpl(docs, "doc_id", "text", tau, 3, bag)
        .count()
      val s = (System.nanoTime() - t0) / 1e9
      operators.Dedup.releasePending()
      (s, n)
    }
    // JIT/codegen warm-up pair, excluded from the medians
    run(bag = true); run(bag = false)
    val results = (1 to rounds).flatMap { r =>
      val (tb, nb) = run(bag = true)
      val (to, no) = run(bag = false)
      require(nb == no, s"round $r: bag-filtered pairs $nb != unfiltered $no")
      println(f"[edjoinprobe] round $r: bagOn=$tb%.2f s bagOff=$to%.2f s pairs=$nb")
      Seq((tb, to))
    }
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.size / 2) }
    println(f"[edjoinprobe] MEDIAN bagOn=${med(results.map(_._1))}%.2f s " +
      f"bagOff=${med(results.map(_._2))}%.2f s over $rounds interleaved rounds " +
      f"(dir=$sfDir tau=$tau cpus=$cpus)")
    spark.stop()
  }
}
