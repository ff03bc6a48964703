package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned merge-on-read lake table — the `PARTITIONED BY` form of
  * [[MorTable]] (the reference's Hudi tables are unpartitioned, SURVEY §4
  * "partition pruning: none"; real lakes partition by ingest date, so this
  * is the shape a 100 TB deployment actually runs).
  *
  * Layout: one child MOR table per partition value,
  * `<path>/p=<value>/{timeline,delta,base}`. That mirrors Hudi's
  * per-file-group independence and buys, with no extra machinery:
  *
  *  - **per-partition compaction** — each child has its own timeline and
  *    num_or_time trigger, so only partitions that received deltas compact;
  *    a hot today-partition can compact every 2 commits while cold history
  *    is never rewritten (the compaction cost is O(churned partitions), not
  *    O(table)).
  *  - **partition-pruned reads** — `read(values)` opens only the named
  *    children; nothing else is even listed.
  *  - **bounded commit fan-out** — a commit runs one write per TOUCHED
  *    partition (CDC batches touch the recent few). The touched-partition
  *    set is collected to the driver; it is small by construction (it is a
  *    GROUP BY over the partition column, not the data).
  *
  * Exactly-once: children share the caller's batchId, so a replayed batch
  * is a per-child no-op; a crash mid-commit re-runs only children that had
  * not committed (their `isCommitted` returns false).
  *
  * Partition values are rendered as strings in directory names (Hive-style
  * `p=<value>`); the partition column stays in the child data, so reads
  * need no reconstruction.
  */
final class PartitionedMorTable(
    spark: SparkSession,
    val path: String,
    val keyCols: Seq[String],
    val partitionCol: String,
    val compactionDeltaCommits: Int = 2,
    val compactionDeltaSeconds: Long = 120L,
    val autoCompact: Boolean = true) {

  private val hPath = new Path(path)
  private def fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Child table for one partition value (creates nothing until written). */
  def child(value: String): MorTable =
    new MorTable(spark, new Path(hPath, s"p=$value").toString, keyCols,
      compactionDeltaCommits, compactionDeltaSeconds, autoCompact)

  /** Partition values present on disk. */
  def partitions(): Seq[String] = {
    if (!fs.exists(hPath)) return Seq.empty
    fs.listStatus(hPath).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("p=")).map(_.stripPrefix("p=")).sorted
  }

  /** Keyed upsert of a batch, split by partition value. One delta commit
    * per touched partition, all tagged with `batchId`. A key must not move
    * between partitions (same rule as Hudi's default key/partition-path
    * contract); use the partition column as part of the key if it can. */
  def upsert(batch: DataFrame, orderWithinBatch: Seq[Column],
             batchId: Long = -1L): PartitionedMorTable = {
    val touched = batch.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0))
    touched.foreach { v =>
      child(v).upsert(batch.filter(col(partitionCol).cast("string") === v),
        orderWithinBatch, batchId)
    }
    this
  }

  /** Tombstone deletes, split by partition (keys must carry partitionCol). */
  def delete(keys: DataFrame, batchId: Long = -1L): PartitionedMorTable = {
    val touched = keys.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0))
    touched.foreach { v =>
      child(v).delete(keys.filter(col(partitionCol).cast("string") === v), batchId)
    }
    this
  }

  /** Snapshot read over the named partitions only (partition pruning), or
    * the whole table when `values` is empty. */
  def read(values: Seq[String] = Seq.empty): DataFrame = {
    val sel = if (values.nonEmpty) values else partitions()
    require(sel.nonEmpty, s"PartitionedMorTable at $path has no partitions")
    sel.map(child(_).read()).reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Trigger the num_or_time compaction check on every partition; only
    * children whose own timeline is due actually compact. Returns the
    * partition values that compacted. */
  def maybeCompact(nowMs: Long = System.currentTimeMillis()): Seq[String] =
    partitions().filter(child(_).maybeCompact(nowMs))

  /** Cleaner across all partitions (see MorTable.clean). */
  def clean(): Int = partitions().map(child(_).clean()).sum

  /** Drop table (all partitions). */
  def drop(): Unit = { fs.delete(hPath, true); () }
}
