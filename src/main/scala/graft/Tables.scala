package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * The `events` table is written with parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We flip the session to
  * `spark.sql.legacy.parquet.nanosAsLong` and expose BOTH a nanosecond long
  * (`ts_ns`, total-ordering-safe) and a derived micro-precision timestamp
  * (`ts`). Queries that must hash-match the DuckDB oracle compare on
  * `ts_ms = epoch millis` (bigint) — integer, precision- and tz-proof.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events with `ts` replaced by: ts_ns (long), ts (TimestampType, micros),
    * ts_ms (long, epoch millis — the oracle-stable column). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // integer `div`, NOT `/`: epoch nanos (~1.7e18) overflow double precision
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
  }
}
