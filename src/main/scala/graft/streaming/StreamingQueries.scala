package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable STREAMING queries: the driver's gate runs these like
  * any batch entry, but the result is produced by a real Structured
  * Streaming job (file source → event-time windowed agg → memory sink,
  * drained with Trigger.AvailableNow) — proving the streaming scan
  * computes exactly the batch semantics (R2/R3: "the stream settles to
  * the table"), hash-checked against the same DuckDB SQL as the batch
  * tumbling aggregate. */
object StreamingQueries {

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** 1-hour tumbling windowed aggregate over a parquet STREAM of events;
    * returns the drained result. Must hash-match r14's batch oracle. */
  def streamTumble(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema // ts is long (nanos)
    val name = s"graft_stream_tumble_${counter.incrementAndGet()}"
    // the file streaming source wants a directory to watch — expose the
    // single events file through a scratch dir (symlink, no copy)
    val watchDir = graft.TempDirs.create("stream-events")
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(watchDir, "events.parquet"),
      java.nio.file.Paths.get(path).toAbsolutePath)
    val agg = spark.readStream.schema(schema).parquet(watchDir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 3).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("cnt"), col("sum_value"))
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming exact dedup over a live file stream: every (user_id,
    * event_type) pair seen at most once, state bounded by the watermark
    * (StreamingOps.streamingDedup — the 100 TB/day ingest shape). Which
    * ROW survives per pair is arrival-order-dependent, so the entry emits
    * only the deduped keys; those settle to exactly the batch DISTINCT,
    * hash-checked against DuckDB. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema // ts is long (nanos)
    val name = s"graft_stream_dedup_${counter.incrementAndGet()}"
    val watchDir = graft.TempDirs.create("stream-dedup")
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(watchDir, "events.parquet"),
      java.nio.file.Paths.get(path).toAbsolutePath)
    val deduped = StreamingOps.streamingDedup(
      spark.readStream.schema(schema).parquet(watchDir)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000"))),
      idCols = Seq("user_id", "event_type"))
      .select(col("user_id"), col("event_type"))
    val q = deduped.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
