package graft.sources

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC side channel — the reference's psycopg2 path (S9/S10, reference
  * `CDC-Hudi-Notebook.zpln:895` preview reads, `:1674`/`:1793` DML) and the
  * EventBridge→Lambda workload generator (T6,
  * `scripts/cdclambda/index.js:4`: `generateticketactivity(500)` per
  * minute).
  *
  * Reads go through `spark.read.jdbc` (filter pushdown to the DB via
  * `PushedFilters`, partitioned reads via the `partitionColumn` overload
  * for big snapshots — the 5M-row person table of zpln:1101 reads with
  * `numPartitions` parallel range queries). The DML side is a plain-JDBC
  * fixture generator, exactly the role the reference's Lambda plays. */
object JdbcSource {

  /** S9 — batch read of a table or pushed-down query. */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S3-snapshot at scale: range-partitioned parallel read (one DB cursor
    * per partition — how a 5M-row snapshot loads without one giant fetch). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)

  /** S10/T6 — deterministic ticket-activity workload generator (the
    * `generateticketactivity(n)` analog): each activity transfers a ticket
    * to a new holder (UPDATE) and appends a purchase-history row (INSERT).
    * Plain JDBC, single connection — it's a test fixture, not an engine
    * operator. Returns the number of activities applied. */
  def generateTicketActivity(url: String, n: Int, seed: Long = 42L): Int = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val rnd = new scala.util.Random(seed)
      val ids = {
        val rs = conn.createStatement().executeQuery(
          "SELECT id, ticketholder_id, ticket_price FROM sporting_event_ticket")
        val buf = scala.collection.mutable.ArrayBuffer[(Double, Double, Float)]()
        while (rs.next()) buf += ((rs.getDouble(1), rs.getDouble(2), rs.getFloat(3)))
        buf.toSeq
      }
      val holders = {
        val rs = conn.createStatement().executeQuery("SELECT id FROM person")
        val buf = scala.collection.mutable.ArrayBuffer[Double]()
        while (rs.next()) buf += rs.getDouble(1)
        buf.toSeq
      }
      val upd = conn.prepareStatement(
        "UPDATE sporting_event_ticket SET ticketholder_id = ? WHERE id = ?")
      val ins = conn.prepareStatement(
        "INSERT INTO ticket_purchase_hist (sporting_event_ticket_id, purchase_by_id, " +
          "transaction_date_time, transferred_from_id, purchase_price) VALUES (?, ?, ?, ?, ?)")
      var applied = 0
      for (i <- 0 until n) {
        val (tid, fromId, price) = ids(rnd.nextInt(ids.size))
        val toId = holders(rnd.nextInt(holders.size))
        upd.setDouble(1, toId); upd.setDouble(2, tid); upd.executeUpdate()
        ins.setDouble(1, tid); ins.setDouble(2, toId)
        ins.setTimestamp(3, new java.sql.Timestamp(1700000000000L + i * 1000L))
        ins.setDouble(4, fromId); ins.setFloat(5, price)
        ins.executeUpdate()
        applied += 1
      }
      conn.commit()
      applied
    } finally conn.close()
  }
}
