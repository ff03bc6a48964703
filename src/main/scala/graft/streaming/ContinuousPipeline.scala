package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Entry point B as an actual Structured Streaming job (reference
  * zpln:2317 + the 1-minute checkpoint cadence of zpln:131).
  *
  * A real logical-replication slot multiplexes every table's changes into
  * ONE ordered WAL; we model exactly that: a single file-based changelog
  * stream whose rows carry a `table` tag and per-table before/after structs
  * (nulls where not applicable). Each micro-batch demuxes back into the
  * three per-table changelogs and runs one IncrementalJoinPipeline batch =
  * one MOR commit per state table + sink (T1: one trigger = one commit).
  */
object ContinuousPipeline {

  /** Merge per-table envelopes into the multiplexed WAL shape. Global
    * ordering comes from `seq` (the WAL LSN analog). */
  def multiplex(person: DataFrame, ticket: DataFrame, hist: DataFrame): DataFrame = {
    def tag(df: DataFrame, t: String, all: Seq[String]) = {
      val tagged = df.select(col("op"), lit(t).as("table"), col("key"), col("seq"),
        col("before").as(s"before_$t"), col("after").as(s"after_$t"))
      all.filterNot(n => n == t).foldLeft(tagged) { (d, o) =>
        d.withColumn(s"before_$o", lit(null)).withColumn(s"after_$o", lit(null))
      }
    }
    val tables = Seq("person", "ticket", "hist")
    val parts = Seq(person, ticket, hist).zip(tables).map { case (df, t) => tag(df, t, tables) }
    // align nullable struct types across the union by name
    parts.reduce(_ unionByName _)
  }

  /** Extract one table's changelog from a multiplexed micro-batch. */
  def demux(batch: DataFrame, table: String): DataFrame =
    batch.filter(col("table") === table)
      .select(col("op"), col("key"),
        col(s"before_$table").as("before"), col(s"after_$table").as("after"),
        col("seq"))

  /** Continuous INSERT INTO ticket_view: stream the multiplexed WAL dir into
    * the pipeline, one micro-batch per trigger tick, exactly-once by the
    * streaming batchId.
    *
    * Pipeline batch id = base + streamingBatchId + 1, where `base` is pinned
    * on first start and persisted INSIDE the checkpoint directory. A restart
    * that reuses the checkpoint reuses the same base, so replayed streaming
    * batch ids map to their original pipeline ids (the sink's exactly-once
    * guard skips them). A restart with a FRESH checkpoint restarts streaming
    * ids at 0 — without the base those would collide with already-committed
    * pipeline ids and be silently dropped; here the new base lands past the
    * sink's max committed id, so no data is lost. */
  def start(spark: SparkSession, pipe: IncrementalJoinPipeline,
            watchDir: String, schemaFrom: DataFrame, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery = {
    val base = pinnedBase(spark, pipe, checkpointDir)
    StreamingOps.changelogStream(spark, watchDir, schemaFrom)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.cache()
        try pipe.processBatch(
          demux(b, "person"), demux(b, "ticket"), demux(b, "hist"),
          base + batchId + 1L)
        finally { b.unpersist(); () }
      }
      .start()
  }

  /** Continuous INSERT INTO driven by a live Debezium-shaped JSON tail
    * (graft.sources.DebeziumSource): the S3/S4 source modes end-to-end from
    * an actual `readStream`, not scripted envelope batches. Same pinned
    * batch-id base and commit-per-trigger contract as [[start]]. */
  def startFromDebezium(spark: SparkSession, pipe: IncrementalJoinPipeline,
                        watchDir: String,
                        merged: org.apache.spark.sql.types.StructType,
                        person: graft.sources.DebeziumSource.Table,
                        ticket: graft.sources.DebeziumSource.Table,
                        hist: graft.sources.DebeziumSource.Table,
                        checkpointDir: String,
                        trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery = {
    val base = pinnedBase(spark, pipe, checkpointDir)
    graft.sources.DebeziumSource.streamJsonDir(spark, watchDir, merged)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.cache()
        try pipe.processBatch(
          graft.sources.DebeziumSource.envelope(b, person),
          graft.sources.DebeziumSource.envelope(b, ticket),
          graft.sources.DebeziumSource.envelope(b, hist),
          base + batchId + 1L)
        finally { b.unpersist(); () }
      }
      .start()
  }

  /** Read the pinned batch-id base from the checkpoint dir, or pin it now:
    * the sink's max committed pipeline batch id at first start. */
  private def pinnedBase(spark: SparkSession, pipe: IncrementalJoinPipeline,
                         checkpointDir: String): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "graft-batch-base")
    val fs = p.getFileSystem(hconf)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong
      finally in.close()
    } else {
      val base = pipe.sink.timeline().map(_.batchId).foldLeft(0L)(math.max)
      val out = fs.create(p, false)
      try out.write(base.toString.getBytes("UTF-8")) finally out.close()
      base
    }
  }
}
