package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.sql.DriverManager
import graft.TestSpark

/** S9/S10/T6 against embedded Derby (in-memory JDBC database): schema load,
  * spark.read.jdbc round-trip with filter pushdown, partitioned snapshot
  * read, and the ticket-activity workload generator driving UPDATE+INSERT
  * the way the reference's Lambda does. */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val setup: Unit = {
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
    for (i <- 1 to 20)
      st.execute(s"INSERT INTO person VALUES ($i.0, 'P$i Last$i', 'Last$i', 'P$i')")
    for (i <- 1 to 10)
      st.execute(s"INSERT INTO sporting_event_ticket VALUES (${100 + i}.0, ${i}.0, ${i * 10}.5)")
    conn.close()
  }

  test("S9 spark.read.jdbc round-trips the snapshot; filters push to the DB") {
    setup
    val df = JdbcSource.read(spark, url, "person")
    assert(df.count() == 20)
    val filtered = df.filter(df("id") === 7.0)
    assert(filtered.count() == 1)
    // filter must reach the JDBC relation (scan, not post-filter);
    // Derby uppercases identifiers in the pushed predicate
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(ID,7.0)"), plan)
  }

  test("S3-snapshot: partitioned JDBC read sees all rows in parallel ranges") {
    setup
    val df = JdbcSource.readPartitioned(spark, url, "person", "id", 1L, 20L, 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 20)
  }

  test("S10/T6 workload generator: n transfers = n history appends + holder updates") {
    setup
    val before = JdbcSource.read(spark, url, "sporting_event_ticket").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val applied = JdbcSource.generateTicketActivity(url, 25, seed = 1L)
    assert(applied == 25)
    val hist = JdbcSource.read(spark, url, "ticket_purchase_hist")
    assert(hist.count() == 25)
    val after = JdbcSource.read(spark, url, "sporting_event_ticket").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(after.keySet == before.keySet)       // transfers, never new tickets
    assert(after != before)                     // at least one holder changed
    // every history row references an existing ticket (FK-shaped integrity)
    val tids = after.keySet
    val histTids = hist.collect().map(_.getDouble(0)).toSet
    assert(histTids.subsetOf(tids))
  }
}
