package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.sql.DriverManager
import graft.TestSpark
import graft.sources.{DebeziumSource, JdbcCdcCapture, JdbcSource}

/** Entry point B with ZERO hand-written envelopes: a live Derby database,
  * the reference's ticket-activity workload generator mutating it over
  * JDBC, trigger-log capture draining those committed changes into
  * Debezium JSON segments, and the streaming pipeline tailing the segment
  * directory — the full snapshot→binlog story driven end-to-end by a real
  * database (the DMS→Kinesis→Flink leg of
  * `lib/rds-cdc-flink-hudi-stack.ts:180-240`, self-contained). */
class DerbyCdcPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:cdcpipedb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE person (id DOUBLE, full_name VARCHAR(64))")
    st.execute("CREATE TABLE sporting_event_ticket (id DOUBLE, " +
      "ticketholder_id DOUBLE, ticket_price REAL)")
    st.execute("CREATE TABLE ticket_purchase_hist (" +
      "hid BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY, " +
      "sporting_event_ticket_id DOUBLE, purchase_by_id DOUBLE, " +
      "transaction_date_time TIMESTAMP, transferred_from_id DOUBLE, " +
      "purchase_price REAL)")
    for (i <- 1 to 6)
      st.execute(s"INSERT INTO person VALUES ($i.0, 'Person$i')")
    for (i <- 1 to 4)
      st.execute(s"INSERT INTO sporting_event_ticket VALUES (${100 + i}.0, $i.0, ${i * 10}.5)")
    conn.close()
  }

  // JDBC reads renamed onto the pipeline's disjoint column space
  private def personSnap: DataFrame = JdbcSource.read(spark, url, "person")
    .select(col("id").as("p_id"), col("full_name"))
  private def ticketSnap: DataFrame = JdbcSource.read(spark, url, "sporting_event_ticket")
    .select(col("id").as("t_id"), col("ticketholder_id").as("holder_id"),
      col("ticket_price").cast("double").as("t_price"))
  private def histSnap: DataFrame = JdbcSource.read(spark, url, "ticket_purchase_hist")
    .select(col("hid"), col("sporting_event_ticket_id").as("h_ticket_id"),
      col("purchase_by_id").as("buyer_id"),
      unix_millis(col("transaction_date_time")).as("tx_ms"),
      col("transferred_from_id").as("from_id"),
      col("purchase_price").cast("double").as("h_price"))

  /** The view recomputed directly from CURRENT database state — the oracle
    * the incrementally-maintained sink must equal. */
  private def expectedView(): Set[(String, Double, Long, Long)] = {
    val joined = personSnap
      .join(ticketSnap, col("p_id") === col("holder_id"))
      .join(histSnap, col("h_ticket_id") === col("t_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("full_name")).orderBy(col("tx_ms").desc, col("hid").desc)
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("full_name"), col("h_price"), col("tx_ms"), col("hid"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("live Derby → trigger capture → Debezium segments → pipeline, no hand-written envelopes") {
    seeded
    val pipe = new IncrementalJoinPipeline(
      spark, TestSpark.tmpDir("derby-cdc-pipe"),
      personKey = "p_id", ticketKey = "t_id", ticketPersonFk = "holder_id",
      histTicketFk = "h_ticket_id", histKeyCols = Seq("hid"),
      histOrder = Seq("tx_ms", "hid"),
      project = j => j.select(col("full_name"), col("h_price"), col("tx_ms"), col("hid")),
      sinkKey = "full_name")
    pipe.initialize(personSnap, ticketSnap, histSnap) // snapshot phase

    // binlog phase: install capture, then let the workload generator run
    val capture = new JdbcCdcCapture(url,
      Seq("person", "sporting_event_ticket", "ticket_purchase_hist"))
    capture.install()

    val merged = StructType(Seq(
      StructField("id", DoubleType), StructField("full_name", StringType),
      StructField("ticketholder_id", DoubleType), StructField("ticket_price", DoubleType),
      StructField("hid", LongType), StructField("sporting_event_ticket_id", DoubleType),
      StructField("purchase_by_id", DoubleType), StructField("transaction_date_time", LongType),
      StructField("transferred_from_id", DoubleType), StructField("purchase_price", DoubleType)))
    val person = DebeziumSource.Table("person",
      Seq("id", "full_name"), Seq("id"), aliases = Seq("p_id", "full_name"))
    val ticket = DebeziumSource.Table("sporting_event_ticket",
      Seq("id", "ticketholder_id", "ticket_price"), Seq("id"),
      aliases = Seq("t_id", "holder_id", "t_price"))
    val hist = DebeziumSource.Table("ticket_purchase_hist",
      Seq("hid", "sporting_event_ticket_id", "purchase_by_id",
        "transaction_date_time", "transferred_from_id", "purchase_price"),
      Seq("hid"),
      aliases = Seq("hid", "h_ticket_id", "buyer_id", "tx_ms", "from_id", "h_price"))

    val watch = TestSpark.tmpDir("derby-cdc-wal")
    val ckpt = TestSpark.tmpDir("derby-cdc-ckpt")

    // round 1: live DML (holder transfers + purchase-history appends)
    assert(JdbcSource.generateTicketActivity(url, 8, seed = 7L) == 8)
    assert(capture.drainSegment(watch) == 16, "8 updates + 8 inserts captured")
    val q1 = ContinuousPipeline.startFromDebezium(spark, pipe, watch, merged,
      person, ticket, hist, ckpt, trigger = Trigger.AvailableNow())
    assert(q1.awaitTermination(180000), "round-1 stream did not drain in 180s")
    val got1 = pipe.sink.read().collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(got1 == expectedView(),
      "sink must equal the view recomputed from live database state")

    // round 2: the tail continues — more DML, another segment, a restart
    assert(JdbcSource.generateTicketActivity(url, 5, seed = 99L) == 5)
    assert(capture.drainSegment(watch) == 10)
    val q2 = ContinuousPipeline.startFromDebezium(spark, pipe, watch, merged,
      person, ticket, hist, ckpt, trigger = Trigger.AvailableNow())
    assert(q2.awaitTermination(180000), "round-2 stream did not drain in 180s")
    val got2 = pipe.sink.read().collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(got2 == expectedView())
    assert(pipe.duplicateCheck().isEmpty)
    // nothing new to drain: the capture's high-water mark advanced
    assert(capture.drainSegment(watch) == 0)
  }

  test("control characters in VARCHAR images stay one JSON line per event") {
    val url2 = "jdbc:derby:memory:cdcescdb;create=true"
    val conn = DriverManager.getConnection(url2)
    conn.createStatement().execute(
      "CREATE TABLE note (id DOUBLE, body VARCHAR(64))")
    val capture = new JdbcCdcCapture(url2, Seq("note"))
    capture.install()
    val dirty = "line1\nline2\ttab\rretctl\"q\\s"
    val ps = conn.prepareStatement("INSERT INTO note VALUES (1.0, ?)")
    ps.setString(1, dirty); ps.executeUpdate()
    val up = conn.prepareStatement("UPDATE note SET body = ? WHERE id = 1.0")
    up.setString(1, dirty + "\n2"); up.executeUpdate()
    conn.close()
    val watch = TestSpark.tmpDir("derby-cdc-esc")
    assert(capture.drainSegment(watch) == 2)
    val raw = java.nio.file.Files.readAllLines(
      java.nio.file.Files.list(java.nio.file.Paths.get(watch)).iterator().next())
    assert(raw.size() == 2, "one JSON line per event, newlines escaped")
    // strict round-trip: both events parse and the dirty string survives
    val parsed = spark.read.json(watch)
    assert(!parsed.columns.contains("_corrupt_record"), parsed.columns.mkString(","))
    val bodies = parsed.select(col("payload.after.body")).collect().map(_.getString(0)).toSet
    assert(bodies == Set(dirty, dirty + "\n2"))
  }
}
