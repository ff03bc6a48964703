package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.ChangelogSource

/** Oracle-checkable end-to-end run of the continuous pipeline (SURVEY §7.3):
  * the reference's `INSERT INTO ticket_view SELECT … 3-way join` (zpln:2317)
  * on the TPC-H stand-ins (FIXTURES §2: customer↔person, orders↔ticket,
  * lineitem↔purchase-history). */
object PipelineQueries {

  private def tempPath(prefix: String): String = graft.TempDirs.create(prefix)

  /** Initialize with customer+orders snapshots (zpln:1101 snapshot phase),
    * then replay lineitem as an append-only changelog in 4 micro-batches
    * (zpln:2078 append-mostly fact). Sink key = c_name, "last transaction"
    * = max (l_orderkey, l_linenumber). Returns the sink snapshot, which
    * must equal the batch QUALIFY-dedup of the same join. */
  def ticketView(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")

    val pipePath = tempPath("pipe-tv")
    val pipe = new IncrementalJoinPipeline(
      spark, pipePath,
      personKey = "c_custkey",
      ticketKey = "o_orderkey",
      ticketPersonFk = "o_custkey",
      histTicketFk = "l_orderkey2",
      histKeyCols = Seq("hid"),
      histOrder = Seq("hid"),
      project = j => j.select(
        col("c_name").as("full_name"),
        col("l_orderkey2").cast("string").as("id"),
        col("l_extendedprice").as("price"),
        unix_millis(col("l_shipdate").cast("timestamp")).as("ts_ms"),
        col("hid")),
      sinkKey = "full_name",
      // bound files-per-commit (the reference's write.tasks=3, zpln:2234):
      // without it every micro-batch delta writes shuffle.partitions=32
      // KB-sized files, and EVERY later snapshot read pays a parallel
      // file-listing JOB per delta dir (32 files = Spark's discovery
      // threshold) — ~30 pure-overhead jobs per replay at 4 batches
      writeTasks = 4)

    // hist uses l_orderkey2 so P/T/H column names stay disjoint (o_orderkey
    // is the ticket pk; l_orderkey is the fact's fk to it). The testdata has
    // duplicate (l_orderkey, l_linenumber) pairs, so the fact PK is a
    // surrogate `hid` whose order matches the total order the DuckDB oracle
    // ranks by: orderkey in the high bits, the within-order rank (≤17 rows
    // per order, so 10 bits is plenty) in the low bits. The rank window is
    // PARTITIONED by orderkey — a global row_number here would funnel the
    // whole fact table through one task (replay scaffolding; a real WAL
    // supplies its own LSN here).
    val perOrder = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey2"))
      .orderBy(col("l_linenumber"), col("l_extendedprice"), col("l_shipdate"))
    val hist = l.withColumnRenamed("l_orderkey", "l_orderkey2")
      .withColumn("hid",
        shiftleft(col("l_orderkey2").cast("long"), 10) +
          row_number().over(perOrder).cast("long"))

    pipe.initialize(c, o, hist.limit(0))

    // pin the envelope ONCE (surrogate-key window + struct build is the
    // replay's single most expensive stage), then pin each micro-batch
    // SLICE: a batch's three consumers (path pre-count, state commit,
    // broadcast build) scan a delta-sized pinned block instead of
    // re-scanning — and re-deserializing — the full cached envelope
    // (measured: 13 full-log scans per replay → 5)
    val log = ChangelogSource.insertsOnly(
      hist.withColumn("seq", col("hid")), Seq("hid")).localCheckpoint(true)
    val emptyP = ChangelogSource.emptyEnvelope(c, Seq("c_custkey"))
    val emptyT = ChangelogSource.emptyEnvelope(o, Seq("o_orderkey"))
    val bounds = ChangelogSource.microBatchBounds(log, 4)
    // per-batch (rows, non-inserts) in ONE bucketed pass over the pinned
    // log — the caller-supplied stats hint that spares processBatch its
    // per-batch probe job (4 jobs per replay; 1.4k/day at a 1-min cadence)
    val bucket = bounds.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, ((s, e), i)) => when(col("seq").between(s, e), lit(i)).otherwise(acc)
    }
    val batchStats = log.groupBy(bucket.as("__b"))
      .agg(count(lit(1)).as("n"), count(when(col("op") =!= "I", true)).as("nu"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    bounds.zipWithIndex.foreach {
      case ((s, e), i) =>
        val dH = log.filter(col("seq").between(s, e)).localCheckpoint(true)
        pipe.processBatch(emptyP, emptyT, dH, batchId = i + 1L,
          hStats = Some(batchStats.getOrElse(i, (0L, 0L))))
    }
    graft.TempDirs.materializeAndDelete(
      pipe.sink.read().select("full_name", "id", "price", "ts_ms"), pipePath)
  }
}
