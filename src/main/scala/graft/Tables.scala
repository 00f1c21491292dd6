package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}

/** Parquet readers for the driver-generated fixture tables
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md). */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")

  /** `events.ts` arrives as epoch-nanos BIGINT regardless of the
    * fixture's physical type, and queries do explicit integer ns
    * arithmetic (ns magnitudes exceed double precision, so never
    * divide through double).
    *
    * The driver has shipped two generations of this fixture:
    * TIMESTAMP(NANOS) (pre-r8), which Spark 4 rejects by default and
    * the legacy conf reads as BIGINT ns directly, and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (r8+), which Spark reads
    * as TIMESTAMP_NTZ — that wall-clock is mapped to epoch micros by
    * PURE NTZ ARITHMETIC, `timestampdiff(MICROSECOND,
    * TIMESTAMP_NTZ'1970-01-01', ts)` (matching DuckDB's zone-free
    * `epoch_us`), and scaled to ns, so both generations present the
    * identical column WITHOUT touching — or even reading — the
    * session's timezone state. (A reader must not silently change the
    * semantics of unrelated local-time queries in the same session,
    * and zone FUNCTIONS are no better: `to_utc_timestamp`/`cast` route
    * NTZ through the session zone. Zone-independence and
    * no-session-mutation are spec-pinned in TablesSpec.) */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    // match on the ACTUAL read type, one zone-free mapping each — a
    // catch-all would silently route a future isAdjustedToUTC=true
    // (LTZ) generation through NTZ/LTZ coercion, which IS
    // session-zone-dependent
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampNTZType => raw.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
          * lit(1000L))
      case TimestampType => // an instant: unix_micros is zone-free on LTZ
        raw.withColumn("ts", org.apache.spark.sql.functions.unix_micros(col("ts"))
          * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet read type $other")
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
}
