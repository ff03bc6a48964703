package graft

import org.apache.spark.sql.SparkSession
import graft.lake.MorTable

/** Catalog surface (S5 and the Glue-catalog analog of §1.1): MOR lake
  * tables registered as session-catalog views so the whole SQL surface —
  * `SELECT * FROM t1`, `DROP TABLE IF EXISTS t1` (zpln:292/:2952) — runs
  * through `spark.sql`. The reference stores table metadata in Glue and
  * shares it between engines; our session catalog plays that role within
  * the SparkSession (swap in a Hive metastore for cross-session sharing). */
object GraftCatalog {

  /** Register (or refresh) a MOR table under a catalog name. The view
    * captures the CURRENT snapshot's file set; re-register after commits
    * you want readers to see (one registration per commit = the reference's
    * reader-sees-committed-data behavior). */
  def register(spark: SparkSession, name: String, table: MorTable): Unit =
    table.read().createOrReplaceTempView(name)

  /** S5 — `DROP TABLE IF EXISTS`: removes catalog metadata; storage stays
    * unless `purge`. Idempotent, like the reference's cleanup cell. */
  def dropTable(spark: SparkSession, name: String, table: Option[MorTable] = None,
                purge: Boolean = false): Unit = {
    spark.catalog.dropTempView(name)
    if (purge) table.foreach(_.drop())
  }

  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)
}
