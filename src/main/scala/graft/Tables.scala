package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the driver-generated fixture tables
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md). */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    * default — read it as epoch-nanos BIGINT (legacy conf) and let
    * queries do explicit integer ns arithmetic (ns magnitudes exceed
    * double precision, so never divide through double). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
}
