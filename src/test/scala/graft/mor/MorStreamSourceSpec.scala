package graft.mor

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.TestSpark
import graft.lake.MorTable

/** Streaming READ of the lake (`readStream.format("graft.mor")`): commits
  * become micro-batches of net images + tombstones, offsets are commit
  * seqs, and checkpoint restarts resume exactly past the delivered seq. */
class MorStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("commits stream as incremental micro-batches; restart resumes past the cursor") {
    val path = TestSpark.tmpDir("mor-stream-src")
    val ckpt = TestSpark.tmpDir("mor-stream-ckpt")
    val t = MorTable(spark, path, Seq("k"), compactionDeltaCommits = 1000)
    t.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), orderWithinBatch = Nil, batchId = 1L)

    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Boolean)]()
    def start() = spark.readStream.format("graft.mor")
      .option("keys", "k").load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => buf.add((r.getAs[String]("k"),
          r.getAs[Int]("v"), r.getAs[Boolean]("_deleted"))))
      }
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(buf.size == 2, s"initial commit delivered, got $buf")
      // a second commit from a DIFFERENT handle: update + delete
      val t2 = MorTable(spark, path, Seq("k"), compactionDeltaCommits = 1000)
      t2.upsert(Seq(("a", 10)).toDF("k", "v"), orderWithinBatch = Nil, batchId = 2L)
      t2.delete(Seq("b").toDF("k"), batchId = 3L)
      q1.processAllAvailable()
      val rows = buf.toArray(Array.empty[(String, Int, Boolean)]).toSeq
      assert(rows.contains(("a", 10, false)), "updated image delivered")
      assert(rows.exists { case (k, _, d) => k == "b" && d }, "tombstone delivered")
    } finally q1.stop()

    // restart from the checkpoint: only commits past the delivered cursor
    // arrive — nothing replays
    buf.clear()
    val t3 = MorTable(spark, path, Seq("k"), compactionDeltaCommits = 1000)
    t3.upsert(Seq(("c", 30)).toDF("k", "v"), orderWithinBatch = Nil, batchId = 4L)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val after = buf.toArray(Array.empty[(String, Int, Boolean)]).toSeq
      assert(after == Seq(("c", 30, false)),
        s"restart must resume past the checkpointed seq, got $after")
    } finally q2.stop()
  }

  test("partitioned form streams token-space CDC ops with before-images") {
    val path = TestSpark.tmpDir("pmor-stream-src")
    val ckpt = TestSpark.tmpDir("pmor-stream-ckpt")
    val key = org.apache.spark.sql.functions.col("k")
    val t = new graft.lake.PartitionedMorTable(spark, path, Seq("k"), "p",
      compactionDeltaCommits = 1000, autoCompact = false)
    t.upsert(Seq(("a", "x", 1), ("b", "y", 2)).toDF("k", "p", "v"),
      Seq(key), batchId = 1L)

    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Any, Any)]()
    def start() = spark.readStream.format("graft.mor")
      .option("keys", "k").option("partition", "p").load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => buf.add((r.getAs[String]("op"),
          r.getAs[String]("k"), r.getAs[Any]("v"), r.getAs[Any]("before_v"))))
      }
      .start()

    val q = start()
    try {
      q.processAllAvailable()
      val first = buf.toArray(Array.empty[(String, String, Any, Any)]).toSeq
      assert(first.toSet == Set(("I", "a", 1, null), ("I", "b", 2, null)),
        s"initial commit streams as inserts, got $first")
      buf.clear()
      // update + delete from a fresh handle
      val t2 = new graft.lake.PartitionedMorTable(spark, path, Seq("k"), "p",
        compactionDeltaCommits = 1000, autoCompact = false)
      t2.upsert(Seq(("a", "x", 10)).toDF("k", "p", "v"), Seq(key), batchId = 2L)
      t2.delete(Seq(("b", "y")).toDF("k", "p"), batchId = 3L)
      q.processAllAvailable()
      val second = buf.toArray(Array.empty[(String, String, Any, Any)]).toSeq
      assert(second.toSet == Set(("U", "a", 10, 1), ("D", "b", null, 2)),
        s"update carries before-image, delete tombstones, got $second")
    } finally q.stop()
  }
}
