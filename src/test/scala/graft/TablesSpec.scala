package graft

/** Fixture-reader contracts — above all, that [[Tables.events]]'s
  * NTZ→epoch-ns mapping is a pure expression: same integers under any
  * session timezone, and no session state mutated as a side effect of
  * reading one table (a reader that flips `spark.sql.session.timeZone`
  * silently changes the semantics of every later local-time query in
  * the session). */
class TablesSpec extends SparkSpec {

  private val TzKey = "spark.sql.session.timeZone"

  private def withSessionZone[A](zone: String)(body: => A): A = {
    val prev = spark.conf.get(TzKey)
    spark.conf.set(TzKey, zone)
    try body finally spark.conf.set(TzKey, prev)
  }

  test("events.ts is session-timezone-independent epoch ns") {
    val utc = Tables.events(spark, sfDir)
      .select("event_id", "ts").orderBy("event_id").collect().toSeq
    val seoul = withSessionZone("Asia/Seoul") {
      Tables.events(spark, sfDir)
        .select("event_id", "ts").orderBy("event_id").collect().toSeq
    }
    assert(utc === seoul)
    // sanity: the values really are ns magnitudes (fixture dates are
    // 2020s → epoch ns ≈ 1.6e18), not micros accidentally unscaled
    val ts0 = utc.head.getLong(1)
    assert(ts0 > 1_000_000_000_000_000_000L, s"ts not in ns: $ts0")
  }

  test("events() leaves spark.sql.session.timeZone untouched") {
    withSessionZone("Asia/Seoul") {
      Tables.events(spark, sfDir).limit(1).collect()
      assert(spark.conf.get(TzKey) === "Asia/Seoul")
    }
  }
}
