package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}

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
    * as TIMESTAMP_NTZ — that wall-clock is mapped through an explicit
    * UTC session zone (matching DuckDB's zone-free `epoch_us`) and
    * scaled to ns, so both generations present the identical column. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
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
