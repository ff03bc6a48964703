package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Oracle-checkable queries that drive the MOR lake table end-to-end.
  * The driver's DuckDB oracle can't see our lake directories, so each query
  * replays driver testdata through a fresh MorTable and returns the snapshot —
  * which must equal the batch-SQL equivalent of the same replay. */
object LakeQueries {

  private def tempPath(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** S1+S6+S7+S11+R12+T4 in one pass: replay `events` as 5 ordered
    * micro-batches of keyed upserts (key = user_id), compacting mid-replay
    * (delta_commits=3 → the num trigger fires during the replay), then
    * snapshot-read. Must equal the batch last-write-wins dedup (oracle:
    * QUALIFY row_number()=1 over user_id ordered by ts, event_id).
    *
    * The ntile window is unpartitioned — that's replay *scaffolding* (micro-
    * batch boundaries normally come from the streaming source), not an engine
    * operator; the engine-side work (upsert dedup, merge-read) is all hashed
    * by key.
    */
  def upsertReplay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_id", "event_type", "value", "ts_ms", "ts_ns")
    val batched = ev
      .withColumn("__b", ntile(5).over(Window.orderBy(col("ts_ns"), col("event_id"))))
      .cache()
    val t = MorTable(spark, tempPath("mor-replay"),
      keyCols = Seq("user_id"), compactionDeltaCommits = 3)
    try {
      (1 to 5).foreach { i =>
        t.upsert(batched.filter(col("__b") === i).drop("__b"),
          orderWithinBatch = Seq(col("ts_ns"), col("event_id")), batchId = i.toLong)
      }
      t.read().select("user_id", "event_id", "event_type", "value", "ts_ms")
    } finally batched.unpersist()
  }
}
