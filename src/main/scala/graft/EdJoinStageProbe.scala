package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level cost attribution for the Ed-Join core at sf0.1 (r16-opt
  * instrument, mirrors the operator's internal pipeline stage by
  * stage): times each sub-pipeline to its own noop sink so the 6-8 s
  * gate median is attributed to classes / grams+freq / prefix window /
  * candidate join+distinct / DP verify rather than guessed at.
  * Temporary measurement main — numbers land in OPTIMIZATION_r16.md.
  */
object EdJoinStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tau = 10; val q = 3
    val docs = Tables.documents(spark, sfDir)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[edjoinstage] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { round =>
      println(s"[edjoinstage] --- round $round ---")
      val rows = docs.select(col("doc_id").as("__id"), col("text").as("__text"))
        .filter(col("__id").isNotNull && col("__text").isNotNull)
      val classes = rows.groupBy(col("__text"))
        .agg(min(col("__id")).as("__rep"), count(lit(1)).as("__csz"))
      t("classes agg")(sink(classes))
      val reps = classes.select(col("__rep").as("__id"), col("__text"))
      val base = reps.withColumn("__len", length(col("__text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fullPrefixLen = q * (tau + 1)
      val grams = base.filter(col("__len") >= fullPrefixLen)
        .select(col("__id"), col("__len"),
          posexplode(expr(s"transform(sequence(0, __len - $q), " +
            s"i -> xxhash64(substring(__text, i + 1, $q)))"))
            .as(Seq("pos", "gram")))
      t("grams explode")(sink(grams))
      val freq = grams.groupBy(col("gram")).agg(count(lit(1)).as("__gfreq"))
      t("freq agg")(sink(freq))
      val prefix = grams.join(freq, "gram")
        .groupBy(col("__id"), col("__len"))
        .agg(collect_list(struct(col("__gfreq"), col("gram"), col("pos")))
          .as("__gs"))
        .select(col("__id"), col("__len"),
          explode(array_distinct(expr(
            s"transform(slice(array_sort(__gs), 1, ${q * tau + 1}), x -> x.gram)")))
            .as("gram"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("prefix agg+slice")(sink(prefix))
      // window-on-longs alternative, same session for honest A/B
      val w = Window.partitionBy(col("__id"))
        .orderBy(col("__gfreq"), col("gram"), col("pos"))
      val prefixW = grams.join(freq, "gram")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= q * tau + 1)
        .select(col("__id"), col("__len"), col("gram"))
        .distinct()
      t("prefix window-on-longs")(sink(prefixW))
      val pa = prefix.select(col("__id").as("id_a"), col("__len").as("len_a"),
        col("gram").as("gram_a"))
      val pb = prefix.select(col("__id").as("id_b"), col("__len").as("len_b"),
        col("gram").as("gram_b"))
      val joined = pa.join(pb,
        col("gram_a") === col("gram_b") &&
          col("id_a") < col("id_b") &&
          abs(col("len_a") - col("len_b")) <= tau)
        .select(col("id_a"), col("id_b"))
      t("cand join (no distinct)")(sink(joined))
      val cands = joined.distinct()
      t("cand join+distinct")(sink(cands))
      val ta = base.select(col("__id").as("id_a"), col("__text").as("__text_a"))
      val tb = base.select(col("__id").as("id_b"), col("__text").as("__text_b"))
      val verified = cands.join(ta, "id_a").join(tb, "id_b")
        .withColumn("edit_dist",
          levenshtein(col("__text_a"), col("__text_b"), tau).cast("long"))
        .filter(col("edit_dist") >= 0)
      t("verify DP (after cached cands)")(sink(verified))
      base.unpersist(); prefix.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
