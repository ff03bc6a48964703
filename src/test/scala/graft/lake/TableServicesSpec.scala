package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Async table services: compaction/clean run on a background thread while
  * a foreground writer keeps committing — the Hudi async-compaction shape.
  * Safety under concurrency is the TABLE's contract (OCC + unfolded
  * protocol, pinned by MultiWriterSpec); these cases pin the service's own
  * behavior: deterministic cycles, background cadence against a live
  * writer, clean scheduling, and the keep-going failure policy. */
class TableServicesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (s"k$i", i)).toDF("k", "v")

  test("runOnce: compacts exactly when due, publishes the manifest") {
    val t = new MorTable(spark, TestSpark.tmpDir("svc-once"), Seq("k"),
      compactionDeltaCommits = 2, autoCompact = false)
    val svc = TableServices(t)
    assert(!svc.runOnce(), "nothing committed yet — not due")
    t.upsert(rows(0, 10), Seq(col("v")), batchId = 1L)
    assert(!svc.runOnce(), "one delta below the num trigger")
    t.upsert(rows(5, 15), Seq(col("v")), batchId = 2L)
    assert(svc.runOnce(), "two deltas at threshold 2 — due")
    assert(svc.compactionsRun == 1 && svc.lastError.isEmpty)
    val c = t.timeline().filter(_.kind == "compact")
    assert(c.size == 1)
    assert(t.read().count() == 15)
  }

  test("background service compacts while a foreground writer keeps committing") {
    val path = TestSpark.tmpDir("svc-bg")
    val t = new MorTable(spark, path, Seq("k"),
      compactionDeltaCommits = 2, autoCompact = false)
    val ref = new MorTable(spark, path + "-ref", Seq("k"),
      compactionDeltaCommits = 1000, autoCompact = false)
    val svc = TableServices(t, periodMs = 100L).start()
    try {
      for (b <- 0 until 5) {
        val batch = rows(b * 8, b * 8 + 12) // overlapping keys across batches
        t.upsert(batch, Seq(col("v")), batchId = b.toLong)
        ref.upsert(batch, Seq(col("v")), batchId = b.toLong)
      }
      // wait for at least one async compaction (5 deltas at threshold 2)
      val deadline = System.currentTimeMillis() + 30000
      while (svc.compactionsRun == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(svc.compactionsRun >= 1,
        s"service never compacted (lastError=${svc.lastError})")
      assert(svc.lastError.isEmpty)
    } finally svc.close()
    // the asynchronously-compacted table answers exactly like the
    // never-compacted reference
    val a = t.read().orderBy("k").collect().map(_.toSeq).toSeq
    val b = ref.read().orderBy("k").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(t.timeline().exists(_.kind == "compact"))
  }

  test("cleanEvery: old deltas are physically removed after the Nth compaction") {
    val t = new MorTable(spark, TestSpark.tmpDir("svc-clean"), Seq("k"),
      compactionDeltaCommits = 2, autoCompact = false)
    val svc = TableServices(t, cleanEvery = 1)
    t.upsert(rows(0, 10), Seq(col("v")), batchId = 1L)
    t.upsert(rows(0, 10).withColumn("v", col("v") + 100), Seq(col("v")), batchId = 2L)
    assert(svc.runOnce())
    // clean ran with the compaction: pre-compaction delta dirs are gone
    val fs = new org.apache.hadoop.fs.Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltaDirs = fs.listStatus(new org.apache.hadoop.fs.Path(t.path, "delta"))
      .map(_.getPath.getName).toSeq
    assert(deltaDirs.isEmpty, s"expected cleaned delta dirs, found $deltaDirs")
    assert(t.read().count() == 10)
    assert(t.read().agg(min(col("v"))).head().getInt(0) == 100)
  }

  test("partitioned service: due children compact in one tick") {
    val p = new PartitionedMorTable(spark, TestSpark.tmpDir("svc-part"),
      keyCols = Seq("k"), partitionCol = "p", compactionDeltaCommits = 2,
      autoCompact = false)
    def batch(tag: Int) = (0 until 20)
      .map(i => (s"k$i", i + tag, if (i % 2 == 0) "even" else "odd"))
      .toDF("k", "v", "p")
    p.upsert(batch(0), Seq(col("v")), batchId = 1L)
    p.upsert(batch(100), Seq(col("v")), batchId = 2L)
    val svc = TableServices(p, periodMs = 60000L, cleanEvery = 0)
    assert(svc.runOnce(), "both children at threshold — due")
    assert(p.read().count() == 20)
    assert(p.read().agg(min(col("v"))).head().getInt(0) == 100)
    assert(!svc.runOnce(), "freshly compacted — nothing due")
  }

  test("failure policy: a throwing cycle records the error and the service continues") {
    var calls = 0
    val svc = TableServices.custom(() => {
      calls += 1
      if (calls == 1) throw new IllegalStateException("transient FS glitch")
      true
    })
    assert(!svc.runOnce())
    assert(svc.lastError.exists(_.getMessage.contains("transient")))
    assert(svc.runOnce(), "next cycle runs despite the earlier failure")
    assert(svc.lastError.isEmpty, "success clears the recorded error")
    assert(svc.compactionsRun == 1)
  }
}
