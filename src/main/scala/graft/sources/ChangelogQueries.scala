package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Oracle-checkable changelog-source queries: R2/R3 (continuous scan
  * materialization) driven from the events table. */
object ChangelogQueries {

  /** Replay events as a per-user changelog (first event = I, later = U,
    * WAL order = event time) and materialize the final relation — what
    * `SELECT * FROM person` settles to after the stream drains
    * (zpln:1147/:1527). Must equal the batch last-write-wins dedup. */
  def materializeEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_id", "event_type", "value", "ts_ms", "ts_ns")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val ops = ev
      .withColumn("op", when(row_number().over(w) === 1, "I").otherwise("U"))
      .withColumn("seq", col("ts_ns"))
    val env = ChangelogSource.fromOps(ops, Seq("user_id"))
    // seq = ts_ns is not a total order per key (duplicate (user_id, ts) pairs
    // are possible at other scales) — event_id DESC matches the oracle's
    // ORDER BY ts DESC, event_id DESC exactly.
    ChangelogSource.materialize(env, Seq("user_id"),
        tiebreak = Seq(col("after.event_id").desc))
      .select("user_id", "event_id", "event_type", "value", "ts_ms")
  }
}
