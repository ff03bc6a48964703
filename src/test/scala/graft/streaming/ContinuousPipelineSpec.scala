package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.sources.ChangelogSource

/** The continuous job end-to-end: multiplexed WAL files → streaming
  * micro-batches → incremental join → MOR sink, with commit-per-trigger
  * and restart recovery (the zpln:2317 long-running INSERT INTO). */
class ContinuousPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multiplexed WAL stream drives the pipeline; one tick = one commit; restart continues") {
    val people = Seq((1.0, "Ann"), (2.0, "Bob")).toDF("id", "full_name")
    val tickets = Seq((10.0, 1.0), (20.0, 2.0)).toDF("tid", "holder_id")
    val hist0 = Seq.empty[(Long, Double, Double)].toDF("hid", "ticket_id", "amt")

    val pipe = new IncrementalJoinPipeline(
      spark, TestSpark.tmpDir("cont-pipe"),
      personKey = "id", ticketKey = "tid", ticketPersonFk = "holder_id",
      histTicketFk = "ticket_id", histKeyCols = Seq("hid"), histOrder = Seq("hid"),
      project = j => j.select(col("full_name"), col("amt"), col("hid")),
      sinkKey = "full_name")
    pipe.initialize(people, tickets, hist0)

    def pLog(rows: (String, Double, String, Long)*) = ChangelogSource.fromOps(
      rows.toSeq.toDF("op", "id", "full_name", "seq"), Seq("id"))
    def hLog(rows: (String, Long, Double, Double, Long)*) = ChangelogSource.fromOps(
      rows.toSeq.toDF("op", "hid", "ticket_id", "amt", "seq"), Seq("hid"))
    val emptyP = ChangelogSource.emptyEnvelope(people, Seq("id"))
    val emptyT = ChangelogSource.emptyEnvelope(tickets, Seq("tid"))
    val emptyH = ChangelogSource.emptyEnvelope(hist0, Seq("hid"))

    val watch = TestSpark.tmpDir("cont-wal")
    val ckpt = TestSpark.tmpDir("cont-ckpt")
    val sample = ContinuousPipeline.multiplex(emptyP, emptyT, emptyH)

    // WAL segment 1: two purchases land
    ContinuousPipeline.multiplex(emptyP, emptyT,
      hLog(("I", 1L, 10.0, 5.0, 1L), ("I", 2L, 20.0, 6.0, 2L)))
      .coalesce(1).write.parquet(s"$watch/seg1")
    val q1 = ContinuousPipeline.start(spark, pipe, s"$watch/*/", sample, ckpt,
      trigger = Trigger.AvailableNow())
    assert(q1.awaitTermination(180000), "seg1 stream did not drain in 180s")
    val afterSeg1 = pipe.sink.read().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(afterSeg1 == Map("Ann" -> 5.0, "Bob" -> 6.0))
    // count DELTA instants only: the sink's num_or_time compaction can
    // legitimately fire on the 120 s time trigger when the suite runs slow,
    // appending a compact instant that a raw size check would trip over
    val sinkCommits1 = pipe.sink.timeline().count(_.kind == "delta")

    // "job restart": segment 2 arrives (rename Ann + a newer purchase)
    ContinuousPipeline.multiplex(
      pLog(("I", 1.0, "Ann", 0L), ("U", 1.0, "Annette", 3L)).filter($"seq" === 3L),
      emptyT, hLog(("I", 3L, 10.0, 7.5, 4L)))
      .coalesce(1).write.parquet(s"$watch/seg2")
    val q2 = ContinuousPipeline.start(spark, pipe, s"$watch/*/", sample, ckpt,
      trigger = Trigger.AvailableNow())
    assert(q2.awaitTermination(180000), "seg2 stream did not drain in 180s")
    val finalState = pipe.sink.read().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Ann renamed (old key retracted) AND her last transaction advanced
    assert(finalState == Map("Annette" -> 7.5, "Bob" -> 6.0))
    // restart processed exactly the new segment: one more sink delta commit
    assert(pipe.sink.timeline().count(_.kind == "delta") == sinkCommits1 + 1)
    assert(pipe.duplicateCheck().isEmpty)
  }

  test("Debezium JSON tail drives the pipeline end-to-end (S3/S4 live seam)") {
    import graft.sources.DebeziumSource
    import org.apache.spark.sql.types._

    val people = Seq((1.0, "Ann"), (2.0, "Bob")).toDF("id", "full_name")
    val tickets = Seq((10.0, 1.0), (20.0, 2.0)).toDF("tid", "holder_id")
    val hist0 = Seq.empty[(Long, Double, Double)].toDF("hid", "ticket_id", "amt")

    val pipe = new IncrementalJoinPipeline(
      spark, TestSpark.tmpDir("dbz-pipe"),
      personKey = "id", ticketKey = "tid", ticketPersonFk = "holder_id",
      histTicketFk = "ticket_id", histKeyCols = Seq("hid"), histOrder = Seq("hid"),
      project = j => j.select(col("full_name"), col("amt"), col("hid")),
      sinkKey = "full_name")
    pipe.initialize(people, tickets, hist0)

    // the connector's merged column set (one slot, messages tagged by table)
    val merged = StructType(Seq(
      StructField("id", DoubleType), StructField("full_name", StringType),
      StructField("tid", DoubleType), StructField("holder_id", DoubleType),
      StructField("hid", LongType), StructField("ticket_id", DoubleType),
      StructField("amt", DoubleType)))
    val person = DebeziumSource.Table("person", Seq("id", "full_name"), Seq("id"))
    val ticket = DebeziumSource.Table("ticket", Seq("tid", "holder_id"), Seq("tid"))
    val hist = DebeziumSource.Table("hist", Seq("hid", "ticket_id", "amt"), Seq("hid"))

    val watch = TestSpark.tmpDir("dbz-wal")
    val ckpt = TestSpark.tmpDir("dbz-ckpt")
    def seg(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$watch/$name"),
        lines.mkString("\n").getBytes("UTF-8"))

    seg("seg1.json",
      """{"payload":{"op":"c","before":null,"after":{"hid":1,"ticket_id":10.0,"amt":5.0},"source":{"table":"hist","lsn":1,"ts_ms":1}}}""",
      """{"payload":{"op":"c","before":null,"after":{"hid":2,"ticket_id":20.0,"amt":6.0},"source":{"table":"hist","lsn":2,"ts_ms":2}}}""")
    val q1 = ContinuousPipeline.startFromDebezium(spark, pipe, watch, merged,
      person, ticket, hist, ckpt, trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q1.awaitTermination(180000), "seg1 stream did not drain in 180s")
    val afterSeg1 = pipe.sink.read().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(afterSeg1 == Map("Ann" -> 5.0, "Bob" -> 6.0))

    // live tail continues: a rename (update with before-image) + new purchase
    seg("seg2.json",
      """{"payload":{"op":"u","before":{"id":1.0,"full_name":"Ann"},"after":{"id":1.0,"full_name":"Annette"},"source":{"table":"person","lsn":3,"ts_ms":3}}}""",
      """{"payload":{"op":"c","before":null,"after":{"hid":3,"ticket_id":10.0,"amt":7.5},"source":{"table":"hist","lsn":4,"ts_ms":4}}}""")
    val q2 = ContinuousPipeline.startFromDebezium(spark, pipe, watch, merged,
      person, ticket, hist, ckpt, trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q2.awaitTermination(180000), "seg2 stream did not drain in 180s")
    val finalState = pipe.sink.read().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(finalState == Map("Annette" -> 7.5, "Bob" -> 6.0))
    assert(pipe.duplicateCheck().isEmpty)

    // ---- CDC SCHEMA DRIFT (the upstream ALTER TABLE ADD COLUMN story):
    // seg3's person payload gains `vip` mid-stream. The declared contract
    // (DebeziumSource.driftedSchema): widen-on-read at restart — old
    // segments null the new field, the state commit widens additively —
    // and non-additive type drift refuses loudly.
    seg("seg3.json",
      """{"payload":{"op":"u","before":{"id":1.0,"full_name":"Annette"},"after":{"id":1.0,"full_name":"Annette","vip":true},"source":{"table":"person","lsn":5,"ts_ms":5}}}""")
    val widened = DebeziumSource.driftedSchema(spark, watch, merged)
    assert(widened.fieldNames.contains("vip"),
      "driftedSchema must discover the additive wire field")
    assert(merged.fields.forall(f => widened.fields.contains(f)),
      "declared fields are forever — widening only appends")
    val personV2 = DebeziumSource.Table("person",
      Seq("id", "full_name", "vip"), Seq("id"))
    val q3 = ContinuousPipeline.startFromDebezium(spark, pipe, watch, widened,
      personV2, ticket, hist, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    assert(q3.awaitTermination(180000), "seg3 stream did not drain in 180s")
    // additive-evolution commit: the person state widened; the pre-drift
    // row reads null for the new column, the drifted row carries it
    val vips = pipe.pState.read().collect()
      .map(r => r.getAs[String]("full_name") ->
        Option(r.getAs[Any]("vip"))).toMap
    assert(vips == Map("Annette" -> Some(true), "Bob" -> None), vips.toString)
    // sink semantics unchanged by the drift
    assert(pipe.sink.read().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      Map("Annette" -> 7.5, "Bob" -> 6.0))
    // narrowing / type drift refuses loudly: a wire field whose inferred
    // type cannot up-cast to the declaration (string where long declared)
    val badWatch = TestSpark.tmpDir("dbz-wal-bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$badWatch/seg1.json"),
      """{"payload":{"op":"c","before":null,"after":{"hid":"not-a-number"},"source":{"table":"hist","lsn":1,"ts_ms":1}}}"""
        .getBytes("UTF-8"))
    val e = intercept[IllegalStateException](
      DebeziumSource.driftedSchema(spark, badWatch, merged))
    assert(e.getMessage.contains("NOT additive"), e.getMessage)
  }
}
