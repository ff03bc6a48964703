package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * The `events` table has shipped in TWO vintages: parquet TIMESTAMP(NANOS)
  * (which Spark's vectorized reader rejects, [PARQUET_TYPE_ILLEGAL] — we flip
  * `spark.sql.legacy.parquet.nanosAsLong` and read a nanos long) and, since
  * round 6, plain micro-precision TIMESTAMP_NTZ. [[tsToNs]] normalizes either
  * into the same surface: `ts_ns` (epoch-nanos long, total-ordering-safe),
  * from which queries derive `ts` (TimestampType, micros) and `ts_ms` (long
  * epoch millis — the oracle-stable column). Sessions run with UTC
  * `spark.sql.session.timeZone` (every main sets it), so the NTZ wall clock
  * IS the epoch instant — the same convention DuckDB's `epoch_ns(ts)`
  * applies on its side of the hash compare.
  */
object Tables {
  /** Relation cache for the READ-ONLY driver testdata files: building
    * `spark.read.parquet(file)` pays a footer-inference job per CALL, and
    * a full gate sweep loads the same ten immutable files a few hundred
    * times (~0.1–0.4 s of pure driver/job overhead per entry — the same
    * cost class MorTable's commit-dir cache removes for lake dirs; at
    * scale this is what a catalog's cached schema does). Keyed by session
    * identity + path; the testdata never mutates, so entries cannot go
    * stale. This caches the RELATION (schema + file index) only — every
    * query still scans the parquet. */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relCache.computeIfAbsent(
      (System.identityHashCode(spark), s"$dir/$name.parquet"),
      k => spark.read.parquet(k._2))

  /** Normalize a raw events frame (batch OR streaming) of either vintage:
    * `ts` (nanos long | timestamp) → `ts_ns` (epoch-nanos long, same column
    * position). Integer math only — epoch nanos (~1.7e18) overflow double. */
  def tsToNs(raw: DataFrame): DataFrame = {
    val ns = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => col("ts")
      case _ => unix_micros(col("ts").cast("timestamp")) * lit(1000L)
    }
    raw.withColumn("ts", ns).withColumnRenamed("ts", "ts_ns")
  }

  /** A literal `ts` value in the RAW vintage of `schema` — for writing
    * synthetic rows (stream sentinels) next to source files so both read
    * under one streaming schema. */
  def tsRawLit(schema: org.apache.spark.sql.types.StructType, ns: Long): org.apache.spark.sql.Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(ns)
      case t => timestamp_micros(lit(ns / 1000L)).cast(t)
    }

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
    tsToNs(load(spark, dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withColumn("ts_ms", expr("ts_ns div 1000000"))
  }
}
