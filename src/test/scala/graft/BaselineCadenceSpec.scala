package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{ChangelogSource, JdbcSource}
import graft.streaming.IncrementalJoinPipeline
import java.sql.DriverManager

/** BASELINE.md derived engine targets, as tests:
  * sustain ≥500 changelog events/min at a 1-minute commit cadence
  * (reference: generateticketactivity(500) on a 1-min EventBridge cron,
  * Hudi commit per checkpoint). One micro-batch carrying one minute's
  * workload (500 ticket transfers = 500 UPDATEs + 500 INSERTs) must
  * process well inside the minute, end-to-end through the real pipeline
  * (JDBC workload → changelog → incremental join → MOR sink). */
class BaselineCadenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val url = "jdbc:derby:memory:cadencedb;create=true"

  test("one minute's workload (500 activities) commits in far under a minute") {
    // -- seed the DB like the reference's dms_sample schema ----------------
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE person (id DOUBLE, full_name VARCHAR(64), " +
      "last_name VARCHAR(32), first_name VARCHAR(32))")
    st.execute("CREATE TABLE sporting_event_ticket (id DOUBLE, " +
      "ticketholder_id DOUBLE, ticket_price REAL)")
    st.execute("CREATE TABLE ticket_purchase_hist (" +
      "sporting_event_ticket_id DOUBLE, purchase_by_id DOUBLE, " +
      "transaction_date_time TIMESTAMP, transferred_from_id DOUBLE, " +
      "purchase_price REAL)")
    for (i <- 1 to 200)
      st.execute(s"INSERT INTO person VALUES ($i.0, 'Person $i', 'P$i', 'N$i')")
    for (i <- 1 to 400)
      st.execute(s"INSERT INTO sporting_event_ticket VALUES (${1000 + i}.0, ${i % 200 + 1}.0, 25.0)")
    conn.close()

    val pipe = new IncrementalJoinPipeline(
      spark, TestSpark.tmpDir("cadence"),
      personKey = "id", ticketKey = "tid", ticketPersonFk = "holder_id",
      histTicketFk = "ticket_id", histKeyCols = Seq("hid"), histOrder = Seq("hid"),
      project = j => j.select(col("full_name"), col("amt"), col("hid")),
      sinkKey = "full_name")

    val person = JdbcSource.read(spark, url, "person")
      .select(col("ID").as("id"), col("FULL_NAME").as("full_name"))
    def tickets = JdbcSource.read(spark, url, "sporting_event_ticket")
      .select(col("ID").as("tid"), col("TICKETHOLDER_ID").as("holder_id"))
    def hist = JdbcSource.read(spark, url, "ticket_purchase_hist")
      .select(monotonically_increasing_id().as("hid"),
        col("SPORTING_EVENT_TICKET_ID").as("ticket_id"),
        col("PURCHASE_PRICE").cast("double").as("amt"))

    pipe.initialize(person, tickets, hist.limit(0))

    // -- one EventBridge tick: 500 activities, then one micro-batch --------
    val t0 = System.nanoTime()
    assert(JdbcSource.generateTicketActivity(url, 500, seed = 7L) == 500)

    val histNow = hist.cache(); histNow.count()
    val ticketsNow = tickets.cache(); ticketsNow.count()
    val dH = ChangelogSource.insertsOnly(histNow.withColumn("seq", col("hid")), Seq("hid"))
    // ticket holder updates arrive as U rows (new images from the DB)
    val dT = ticketsNow.select(lit("U").as("op"),
      col("tid").cast("string").as("key"),
      lit(null).cast(org.apache.spark.sql.types.StructType(ticketsNow.schema.fields)).as("before"),
      struct(col("tid"), col("holder_id")).as("after"),
      lit(1L).as("seq"))
    pipe.processBatch(
      ChangelogSource.emptyEnvelope(person, Seq("id")), dT, dH, batchId = 1L)
    val sec = (System.nanoTime() - t0) / 1e9

    // correctness: every transferred ticket's last purchase is in the sink
    assert(pipe.sink.read().count() > 0)
    assert(pipe.duplicateCheck().isEmpty)
    // cadence: well inside the 1-minute commit window (≤2-commit staleness
    // holds trivially when each batch fits its window)
    assert(sec < 60.0, s"one minute's workload took ${sec}s")
    info(f"500-activity micro-batch end-to-end: $sec%.1f s")
    Seq(histNow, ticketsNow).foreach(_.unpersist())
  }
}
