package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** MOR lake table semantics, mirroring the reference notebook's embedded
  * goldens (SURVEY §5.1): 8-row batch insert (zpln:375→:521), keyed upsert
  * replacing id1 (zpln:577→:723), snapshot reads across compaction
  * (zpln:421), tombstone deletes, and exactly-once batch replay. */
class MorTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t1Rows = Seq(
    ("id1", "Danny", 23, "1970-01-01 00:00:01"),
    ("id2", "Stephen", 33, "1970-01-01 00:00:02"),
    ("id3", "Julian", 53, "1970-01-01 00:00:03"),
    ("id4", "Fabian", 31, "1970-01-01 00:00:04"),
    ("id5", "Sophia", 18, "1970-01-01 00:00:05"),
    ("id6", "Emma", 20, "1970-01-01 00:00:06"),
    ("id7", "Bob", 44, "1970-01-01 00:00:07"),
    ("id8", "Han", 56, "1970-01-01 00:00:08"),
  ).toDF("uuid", "name", "age", "ts")

  test("S6 batch insert: 8 rows land; snapshot returns them (zpln:521 golden)") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-insert"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, orderWithinBatch = Seq(col("ts")))
    val got = t.read().orderBy("uuid").collect()
    assert(got.length == 8)
    assert(got.head.getAs[String]("name") == "Danny")
    assert(t.snapshot().columns.contains("_commit_seqno"))
  }

  test("S7 keyed upsert: id1 replaced in place, still 8 rows (zpln:723 golden)") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-upsert"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")))
    t.upsert(Seq(("id1", "Francisco Morillo", 29, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))
    val got = t.read().orderBy("uuid").collect()
    assert(got.length == 8)
    val id1 = got.head
    assert(id1.getAs[String]("name") == "Francisco Morillo")
    assert(id1.getAs[Int]("age") == 29)
  }

  test("upsertIfNew: write-path bloom/range tagging proves newness and never lies") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-ifnew"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")), batchId = 1L)
    t.compact() // manifest publishes per-file key bounds + blooms
    def row(u: String, n: String) = Seq((u, n, 1, "1970-01-01 00:01:00"))
      .toDF("uuid", "name", "age", "ts")
    // beyond the base max key: provable from bounds alone (no scan path)
    assert(t.upsertIfNew(row("zz1", "New1"), Seq(col("ts")), batchId = 11L))
    assert(t.timeline().last.insertOnly, "proven-new commit must carry the flag")
    // new key INSIDE the base key range: the bloom probe proves it
    assert(t.upsertIfNew(row("id15", "Mid"), Seq(col("ts")), batchId = 12L))
    // an existing key must never be claimed new (no-false-negatives law)
    assert(!t.upsertIfNew(row("id3", "Updated"), Seq(col("ts")), batchId = 13L))
    assert(!t.timeline().last.insertOnly)
    // a tombstoned key still occupies its key — not new either
    t.delete(Seq("zz1").toDF("uuid"), batchId = 14L)
    assert(!t.upsertIfNew(row("zz1", "Back"), Seq(col("ts")), batchId = 15L))
    // end-to-end LWW through the mixed flagged/unflagged commits
    val got = t.read().collect()
      .map(r => r.getAs[String]("uuid") -> r.getAs[String]("name")).toMap
    assert(got.size == 10) // 8 base + zz1 (re-inserted) + id15
    assert(got("id3") == "Updated" && got("id15") == "Mid" && got("zz1") == "Back")
  }

  test("upsertPartial: null and absent columns keep current values (partial payload)") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-partial"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")), batchId = 1L)
    // narrow batch (uuid+name only): age and ts must carry over
    t.upsertPartial(Seq(("id2", "Renamed")).toDF("uuid", "name"), batchId = 2L)
    // explicit null keeps, non-null replaces; an unmatched key inserts
    t.upsertPartial(Seq(
      ("id3", null.asInstanceOf[String], 99), ("id9", "Nine", 9))
      .toDF("uuid", "name", "age"), batchId = 3L)
    val got = t.read().collect().map(r => r.getAs[String]("uuid") ->
      ((r.getAs[String]("name"), r.getAs[Integer]("age"), r.getAs[String]("ts")))).toMap
    assert(got.size == 9)
    assert(got("id2") == (("Renamed", 33, "1970-01-01 00:00:02")), got("id2"))
    assert(got("id3") == (("Julian", 99, "1970-01-01 00:00:03")), got("id3"))
    assert(got("id9") == (("Nine", 9, null)), got("id9"))
    // cardinality rule: duplicate keys refuse loudly
    val e = intercept[IllegalArgumentException](t.upsertPartial(
      Seq(("id1", "A"), ("id1", "B")).toDF("uuid", "name")))
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("size-targeted compaction: output file count tracks live bytes over target") {
    // ~20k rows of incompressible-ish hex payload — a few hundred KB on disk
    val rows = (1 to 20000).map { i =>
      (f"k$i%08d", java.lang.Long.toHexString(i * 2654435761L) * 8)
    }.toDF("k", "v")
    val a = new MorTable(spark, TestSpark.tmpDir("mor-size-a"), Seq("k"),
      compactionDeltaCommits = 100, targetFileBytes = 64 * 1024)
    a.upsert(rows, Seq(col("v")), batchId = 1L)
    a.compact()
    val aFiles = a.read().inputFiles.length
    val b = new MorTable(spark, TestSpark.tmpDir("mor-size-b"), Seq("k"),
      compactionDeltaCommits = 100, targetFileBytes = 1L << 40)
    b.upsert(rows, Seq(col("v")), batchId = 1L)
    b.compact()
    val bFiles = b.read().inputFiles.length
    assert(bFiles == 1, s"huge target must emit one file, got $bFiles")
    assert(aFiles >= 4, s"64 KB target over >256 KB of data must split, got $aFiles")
    assert(a.read().count() == 20000 && b.read().count() == 20000)
    // declared as policy (`target.file.mb`), inherited by a fresh handle
    val dirC = TestSpark.tmpDir("mor-size-c")
    val c = MorTable.resolve(spark, dirC, Seq("k"),
      declared = Some(MorTable.Policy(deltaCommits = 100, targetFileMB = 7)))
    assert(c.targetFileBytes == 7L * 1024 * 1024)
    assert(MorTable.resolve(spark, dirC, Seq("k")).targetFileBytes == 7L * 1024 * 1024,
      "fresh handle must inherit the persisted sizing target")
  }

  test("R12 within-batch last-write-wins uses the given ordering") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-lww"), Seq("k"),
      compactionDeltaCommits = 100)
    val batch = Seq(("a", 1, 10L), ("a", 2, 20L), ("b", 9, 5L))
      .toDF("k", "v", "ord")
    t.upsert(batch, Seq(col("ord")))
    val m = t.read().collect().map(r => r.getAs[String]("k") -> r.getAs[Int]("v")).toMap
    assert(m == Map("a" -> 2, "b" -> 9))
  }

  test("delete writes tombstones; snapshot hides the key") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-del"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")))
    t.delete(Seq("id3", "id7").toDF("uuid"))
    val keys = t.read().select("uuid").as[String].collect().toSet
    assert(keys == Set("id1", "id2", "id4", "id5", "id6", "id8"))
    // re-inserting a deleted key resurrects it (newer seqno wins)
    t.upsert(Seq(("id3", "Julian2", 54, "2024-01-01 00:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))
    assert(t.read().filter($"uuid" === "id3").count() == 1)
  }

  test("T4 num-trigger compaction: snapshot identical before and after (zpln:292)") {
    val dir = TestSpark.tmpDir("mor-compact")
    val noCompact = MorTable(spark, dir + "-ref", Seq("uuid"), compactionDeltaCommits = 100)
    val compacting = MorTable(spark, dir, Seq("uuid"), compactionDeltaCommits = 2)
    for (t <- Seq(noCompact, compacting)) {
      t.upsert(t1Rows, Seq(col("ts")))
      t.upsert(Seq(("id1", "Francisco", 29, "2023-06-15 12:00:00"))
        .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))
      t.delete(Seq("id8").toDF("uuid"))
    }
    // 3 delta commits at threshold 2 → at least one compact instant exists
    assert(compacting.timeline().exists(_.kind == "compact"))
    assert(noCompact.timeline().forall(_.kind == "delta"))
    val a = noCompact.read().orderBy("uuid").collect().map(_.toSeq).toSeq
    val b = compacting.read().orderBy("uuid").collect().map(_.toSeq).toSeq
    assert(a == b)
    // post-compaction snapshot reads only the base (single-source fast path)
    val afterOnlyBase = compacting.timeline().last.kind == "compact"
    if (afterOnlyBase) assert(compacting.read().count() == 7)
  }

  test("T1 exactly-once: replaying a committed batchId is a no-op") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-once"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")), batchId = 7L)
    val n1 = t.timeline().size
    t.upsert(t1Rows, Seq(col("ts")), batchId = 7L) // replay
    assert(t.timeline().size == n1)
    assert(t.read().count() == 8)
  }

  test("additive schema evolution: old commits read back with nulls for new columns") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-evo"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(Seq(("id1", "Danny")).toDF("uuid", "name"), Seq(col("uuid")))
    t.upsert(Seq(("id2", "Emma", 20)).toDF("uuid", "name", "age"), Seq(col("uuid")))
    val got = t.read().orderBy("uuid").collect()
    assert(got.map(_.getAs[String]("name")).toSeq == Seq("Danny", "Emma"))
    assert(got(0).isNullAt(got(0).fieldIndex("age")))
    assert(got(1).getAs[Int]("age") == 20)
  }

  test("time travel: readAt(seq) reproduces any historical snapshot") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-tt"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")))                                    // seq 1
    t.upsert(Seq(("id1", "Francisco", 29, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))               // seq 2
    t.delete(Seq("id8").toDF("uuid"))                                   // seq 3
    assert(t.readAt(1).count() == 8)
    assert(t.readAt(1).filter($"uuid" === "id1").head().getAs[String]("name") == "Danny")
    assert(t.readAt(2).filter($"uuid" === "id1").head().getAs[String]("name") == "Francisco")
    assert(t.readAt(2).count() == 8)
    assert(t.readAt(3).count() == 7)   // == read()
  }

  test("deleteWhere / updateWhere: predicate row-level ops (MERGE analogs)") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-rowops"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")))
    t.updateWhere($"age" >= 50, Map("name" -> concat($"name", lit(" Sr."))))
    val names = t.read().collect()
      .map(r => r.getAs[String]("uuid") -> r.getAs[String]("name")).toMap
    assert(names("id3") == "Julian Sr." && names("id8") == "Han Sr.")
    assert(names("id1") == "Danny", "unmatched rows untouched")
    t.deleteWhere($"age" < 21)
    assert(t.read().collect().map(_.getAs[String]("uuid")).toSet ==
      Set("id1", "id2", "id3", "id4", "id7", "id8")) // Sophia(18), Emma(20) gone
  }

  test("readChangelog classifies net I/U/D with both images; insert+delete nets out") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-cdc"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")))                                    // seq 1
    t.upsert(Seq(
      ("id1", "Francisco", 29, "2023-06-15 12:00:00"),                  // update
      ("id9", "Nova", 1, "2023-06-15 12:00:01")                         // insert
    ).toDF("uuid", "name", "age", "ts"), Seq(col("ts")))                // seq 2
    t.upsert(Seq(("id10", "Ghost", 2, "2023-06-15 12:00:02"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))               // seq 3
    t.delete(Seq("id8", "id10").toDF("uuid"))                           // seq 4
    val rows = t.readChangelog(1L).collect()
      .map(r => r.getAs[String]("uuid") -> r).toMap
    assert(rows.keySet == Set("id1", "id9", "id8"), "id10 nets out (born+deleted in range)")
    assert(rows("id1").getAs[String]("op") == "U" &&
      rows("id1").getAs[String]("name") == "Francisco" &&
      rows("id1").getAs[String]("before_name") == "Danny")
    assert(rows("id9").getAs[String]("op") == "I" &&
      rows("id9").getAs[String]("before_name") == null)
    assert(rows("id8").getAs[String]("op") == "D" &&
      rows("id8").getAs[String]("name") == null &&
      rows("id8").getAs[String]("before_name") == "Han")
    // empty range → empty changelog with the same shape
    assert(t.readChangelog(4L).isEmpty)
  }

  test("snapshot manifest: any parquet reader gets a consistent stale snapshot") {
    val path = TestSpark.tmpDir("mor-manifest")
    val t = MorTable(spark, path, Seq("uuid"), compactionDeltaCommits = 100)
    t.upsert(t1Rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.upsert(t1Rows.filter(col("uuid") === "id1").withColumn("age", lit(99)),
      orderWithinBatch = Seq(col("ts")), batchId = 2L)
    t.compact()
    val asOfCompact = t.read().orderBy("uuid").collect().toSeq
    assert(MorTable.readManifest(spark, path).orderBy("uuid").collect().toSeq ==
      asOfCompact, "external manifest read must equal read() right after compaction")
    // newer deltas make the manifest STALE but still consistent as-of its base
    t.upsert(t1Rows.filter(col("uuid") === "id2").withColumn("age", lit(1)),
      orderWithinBatch = Seq(col("ts")), batchId = 3L)
    assert(MorTable.readManifest(spark, path).orderBy("uuid").collect().toSeq ==
      asOfCompact, "manifest stays pinned to its compaction")
    t.compact() // refresh: the new manifest sees the newer commit
    assert(MorTable.readManifest(spark, path)
      .filter(col("uuid") === "id2").head().getAs[Int]("age") == 1)
  }

  test("readForKeys: key set pushed into every commit scan; equals filtered read") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-keys"), Seq("uuid"),
      compactionDeltaCommits = 2)
    t.upsert(t1Rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.upsert(t1Rows.filter(col("uuid") === "id1").withColumn("age", lit(99)),
      orderWithinBatch = Seq(col("ts")), batchId = 2L)   // base + delta live
    t.upsert(t1Rows.filter(col("uuid") === "id2").withColumn("age", lit(77)),
      orderWithinBatch = Seq(col("ts")), batchId = 3L)
    val pruned = t.readForKeys(Seq("id1", "id2", "id404"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("In(_record_key"),
      s"key predicate must reach the parquet scans as a pushed filter:\n$plan")
    val got = pruned.orderBy("uuid").collect().map(r =>
      r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq
    assert(got == Seq("id1" -> 99, "id2" -> 77))
    assert(t.readForKeys(Nil).isEmpty)
  }

  test("readForKeyRange: manifest key bounds skip base files at the listing level") {
    val path = TestSpark.tmpDir("mor-range")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.compact() // 4 range-partitioned base files + per-file bounds
    t.upsert(Seq(("k050", "upd", -1, "1970-01-01 00:00:09"),
      ("zzz", "new", -2, "1970-01-01 00:00:09"))
      .toDF("uuid", "name", "age", "ts"),
      orderWithinBatch = Seq(col("ts")), batchId = 2L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseSeq = t.timeline().filter(_.kind == "compact").last.seq
    val baseFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/base/$baseSeq"))
      .map(_.getPath.getName).count(_.endsWith(".parquet"))
    assert(baseFiles == 4)
    // a narrow range must not open every base file
    val narrow = t.readForKeyRange("k040", "k060")
    val scannedBase = narrow.inputFiles.count(_.contains("/base/"))
    assert(scannedBase < baseFiles,
      s"range read scanned $scannedBase of $baseFiles base files — no file skip")
    // and must still merge the live delta on top (LWW for k050)
    val got = narrow.orderBy("uuid").collect()
      .map(r => r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq
    assert(got == ((40 until 60).map(i => f"k$i%03d" -> i)
      .map { case (k, a) => if (k == "k050") k -> -1 else k -> a }))
    // a range beyond every base file's bounds: zero base files, delta only
    val high = t.readForKeyRange("z", "zzzz")
    assert(high.inputFiles.count(_.contains("/base/")) == 0)
    assert(high.select("uuid").as[String].collect().toSeq == Seq("zzz"))
    // equality with the unpruned filtered read over the whole table
    val full = t.read().filter(col("uuid") >= "k040" && col("uuid") < "k060")
      .orderBy("uuid").collect().toSeq
    assert(t.readForKeyRange("k040", "k060").orderBy("uuid").collect().toSeq == full)
  }

  test("compacted base carries a _record_key bloom filter (point-read row-group skipping)") {
    val path = TestSpark.tmpDir("mor-bloom")
    val t = MorTable(spark, path, Seq("uuid"), compactionDeltaCommits = 100)
    t.upsert(t1Rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.compact()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseSeq = t.timeline().filter(_.kind == "compact").last.seq
    val parquets = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/base/$baseSeq"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    assert(parquets.nonEmpty)
    import scala.jdk.CollectionConverters._
    val withBloom = parquets.count { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(p, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.exists(_.getColumns.asScala.exists(c =>
        c.getPath.toDotString == "_record_key" && c.getBloomFilterOffset >= 0))
      finally r.close()
    }
    assert(withBloom == parquets.length,
      s"every base file must carry the key bloom filter ($withBloom/${parquets.length})")
    // and the point read that benefits still answers correctly
    assert(t.readForKeys(Seq("id1")).count() == 1)
  }

  test("manifest bloom index prunes base files for point reads at the listing level") {
    val path = TestSpark.tmpDir("mor-bloomidx")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.compact() // 4 base files, per-file key blooms in the manifest
    t.upsert(Seq(("k050", "upd", -1, "1970-01-01 00:00:09"),
      ("zzz", "new", -2, "1970-01-01 00:00:09"))
      .toDF("uuid", "name", "age", "ts"),
      orderWithinBatch = Seq(col("ts")), batchId = 2L)
    // a single-key read must not open every base file — the bloom proves
    // the other files cannot contain the key (file NAME keying, no false
    // negatives), so they are dropped before any task runs
    val one = t.readForKeys(Seq("k123"))
    val scannedBase = one.inputFiles.count(_.contains("/base/"))
    assert(scannedBase < 4,
      s"point read scanned $scannedBase of 4 base files — bloom index not pruning")
    assert(one.collect().map(r =>
      r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq == Seq("k123" -> 123))
    // delta rows survive pruning: k050's base file prunes to the bloom hit,
    // the live delta still wins LWW on top
    val upd = t.readForKeys(Seq("k050"))
    assert(upd.collect().map(r =>
      r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq == Seq("k050" -> -1))
    // a key present ONLY in the live delta: blooms prune every base file
    // (Some(Nil) folds the base to an empty relation) yet the delta answers
    val deltaOnly = t.readForKeys(Seq("zzz"))
    assert(deltaOnly.inputFiles.count(_.contains("/base/")) == 0,
      "no base file should survive bloom pruning for a delta-only key")
    assert(deltaOnly.collect().map(r =>
      r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq == Seq("zzz" -> -2))
    // absent key: empty result, not an error
    assert(t.readForKeys(Seq("nope")).isEmpty)
    // equality with the unpruned filtered read for a multi-file key set
    val keys = Seq("k001", "k123", "k250", "k399", "k050", "zzz")
    val full = t.read().filter(col("uuid").isin(keys: _*))
      .orderBy("uuid").collect().toSeq
    assert(t.readForKeys(keys).orderBy("uuid").collect().toSeq == full)
  }

  test("record-level index pins point reads to exact base files") {
    val path = TestSpark.tmpDir("mor-rli")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    // no compacted base yet: nothing to index
    intercept[IllegalStateException](t.buildRecordIndex())
    t.compact()
    assert(!t.hasRecordIndex())
    t.buildRecordIndex()
    assert(t.hasRecordIndex())
    t.upsert(Seq(("k050", "upd", -1, "1970-01-01 00:00:09"),
      ("zzz", "new", -2, "1970-01-01 00:00:09"))
      .toDF("uuid", "name", "age", "ts"),
      orderWithinBatch = Seq(col("ts")), batchId = 2L)
    // exact pinning: a single-key probe opens exactly ONE base file — the
    // index is a total key→file map, not a probabilistic filter
    val one = t.readForKeysIndexed(Seq("k123"))
    assert(one.inputFiles.count(_.contains("/base/")) == 1,
      "record index must pin a single-key probe to exactly one base file")
    assert(one.collect().map(r =>
      r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq == Seq("k123" -> 123))
    // the live delta still wins LWW over the pinned base file
    assert(t.readForKeysIndexed(Seq("k050")).collect().map(r =>
      r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq == Seq("k050" -> -1))
    // delta-only key: zero base files scanned, the delta answers
    val deltaOnly = t.readForKeysIndexed(Seq("zzz"))
    assert(deltaOnly.inputFiles.count(_.contains("/base/")) == 0)
    assert(deltaOnly.collect().map(r =>
      r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq == Seq("zzz" -> -2))
    // absent key: empty, and no base file opened
    assert(t.readForKeysIndexed(Seq("nope")).isEmpty)
    // equality with the unpruned filtered read for a multi-file key set
    val keys = Seq("k001", "k123", "k250", "k399", "k050", "zzz")
    val full = t.read().filter(col("uuid").isin(keys: _*))
      .orderBy("uuid").collect().toSeq
    assert(t.readForKeysIndexed(keys).orderBy("uuid").collect().toSeq == full)
    // fail closed: with the index gone, the read falls back to the bloom
    // path and still answers exactly
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "manifest/rli"), true)
    assert(!t.hasRecordIndex())
    assert(t.readForKeysIndexed(keys).orderBy("uuid").collect().toSeq == full)
  }

  test("record index refreshes across compactions; minor compaction carries postings") {
    val path = TestSpark.tmpDir("mor-rli-refresh")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.compact()
    t.buildRecordIndex()
    // narrow touch: contiguous keys hit one of the 4 range-partitioned
    // files; a tombstone lands in another — at least one file CARRIES
    t.updateWhere(col("uuid").between("k010", "k019"),
      Map("name" -> lit("patched")), batchId = 2L)
    t.deleteWhere(col("uuid") === "k111", batchId = 3L)
    t.compactMinor()
    assert(t.hasRecordIndex(), "index must auto-refresh through compactMinor")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rliRoot = new org.apache.hadoop.fs.Path(path, "manifest/rli")
    def latestRli(): String = fs.listStatus(rliRoot)
      .map(_.getPath).maxBy(_.getName.toLong).toString
    def indexRows(): Seq[(String, String)] =
      spark.read.parquet(latestRli()).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val carried = indexRows()
    assert(carried.exists(_._2.startsWith("carry-")),
      "minor refresh must carry postings under the carried file names")
    // the carried index equals a from-scratch rebuild exactly
    t.buildRecordIndex()
    assert(indexRows() == carried,
      "carry-path refresh must equal the full rebuild")
    // point reads through the refreshed index: patched, deleted, untouched
    assert(t.readForKeysIndexed(Seq("k015")).collect().map(r =>
      r.getAs[String]("name")).toSeq == Seq("patched"))
    assert(t.readForKeysIndexed(Seq("k111")).isEmpty)
    assert(t.readForKeysIndexed(Seq("k300")).collect().map(r =>
      r.getAs[Int]("age")).toSeq == Seq(300))
    // a FULL compact refreshes too (no carried files: straight rebuild)
    t.upsert(Seq(("k200", "upd2", -5, "1970-01-01 00:00:10"))
      .toDF("uuid", "name", "age", "ts"),
      orderWithinBatch = Seq(col("ts")), batchId = 4L)
    t.compact()
    assert(t.hasRecordIndex(), "index must auto-refresh through compact")
    val afterFull = t.readForKeysIndexed(Seq("k200"))
    assert(afterFull.inputFiles.count(_.contains("/base/")) == 1)
    assert(afterFull.collect().map(r =>
      r.getAs[Int]("age")).toSeq == Seq(-5))
  }

  test("secondary bloom index: equality reads on a non-key column prune base files") {
    val path = TestSpark.tmpDir("mor-sidx")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.indexColumns(Seq("age"))
    t.compact() // manifest now carries per-file age blooms
    t.upsert(Seq(("k050", "upd", 7777, "1970-01-01 00:00:09"), // age moves OUT of any probe
      ("newk", "new", 123, "1970-01-01 00:00:09"))              // delta-only probe hit
      .toDF("uuid", "name", "age", "ts"),
      orderWithinBatch = Seq(col("ts")), batchId = 2L)
    // single-value probe: files are key-range-partitioned, so age values
    // scatter — but each file still holds a DISTINCT quarter of the ages
    // (age == key order here), and the bloom prunes the rest
    val one = t.readForColEquals("age", Seq(123))
    val scannedBase = one.inputFiles.count(_.contains("/base/"))
    assert(scannedBase < 4,
      s"equality read scanned $scannedBase of 4 base files — secondary index not pruning")
    // both the base row (k123) and the delta insert (newk) carry age=123
    assert(one.orderBy("uuid").collect().map(r =>
      (r.getAs[String]("uuid"), r.getAs[Int]("age"))).toSeq ==
      Seq("k123" -> 123, "newk" -> 123))
    // moved-out value: k050's latest image has age=7777 — probing its OLD
    // age (50) must not resurrect the in-set past
    assert(t.readForColEquals("age", Seq(50)).isEmpty)
    assert(t.readForColEquals("age", Seq(7777))
      .select("uuid").as[String].collect().toSeq == Seq("k050"))
    // equality with the filtered full read for a multi-value probe
    val vals = Seq(1, 123, 250, 399, 7777)
    val full = t.read().filter(col("age").isin(vals: _*))
      .orderBy("uuid").collect().toSeq
    assert(t.readForColEquals("age", vals).orderBy("uuid").collect().toSeq == full)
    // a FRESH handle inherits the index column set: its next plain compact
    // keeps publishing sblooms (folding the delta in)
    val t2 = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t2.compact()
    val afterFold = t2.readForColEquals("age", Seq(7777))
    assert(afterFold.select("uuid").as[String].collect().toSeq == Seq("k050"))
    assert(afterFold.inputFiles.count(_.contains("/base/")) < 4,
      "inherited index cols must keep pruning after a fresh-handle compact")
  }

  test("two uncoordinated writers never lose a commit (inflight seq allocation)") {
    val path = TestSpark.tmpDir("mor-occ")
    def handle() = MorTable(spark, path, Seq("uuid"), compactionDeltaCommits = 1000)
    handle().upsert(Seq(("seed", 0)).toDF("uuid", "v"), Seq(col("v")))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    // two separate handles (no shared JVM lock) hammer the same table path
    val writers = (1 to 2).map { w =>
      Future {
        val h = handle()
        (1 to 5).foreach { i =>
          h.upsert(Seq((s"w$w-$i", i)).toDF("uuid", "v"), Seq(col("v")))
        }
      }
    }
    writers.foreach(Await.result(_, 180.seconds))
    val t = handle()
    // every commit visible (the pre-OCC scheme silently lost same-seq races)
    assert(t.read().count() == 11, t.read().collect().mkString(","))
    val seqs = t.timeline().map(_.seq)
    assert(seqs == seqs.distinct, s"duplicate seqs: $seqs")
    // all inflight markers released
    val leftover = new java.io.File(s"$path/timeline").listFiles()
      .map(_.getName).filter(_.endsWith(".inflight"))
    assert(leftover.isEmpty, leftover.mkString(","))
  }

  test("rollback discards newer commits; rolled-back batchId is re-committable") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-rb"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")), batchId = 1L)                      // seq 1
    t.upsert(Seq(("id1", "Francisco", 29, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 2L) // seq 2
    t.delete(Seq("id8").toDF("uuid"))                                   // seq 3
    assert(t.read().count() == 7)
    assert(t.rollback(1) == 2) // discard the upsert and the delete
    assert(t.read().count() == 8)
    assert(t.read().filter($"uuid" === "id1").head().getAs[String]("name") == "Danny")
    assert(!t.isCommitted(2L), "rolled-back batch must be re-committable")
    // re-ingest the rolled-back batch — lands again as a fresh commit
    t.upsert(Seq(("id1", "Francisco", 29, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 2L)
    assert(t.read().filter($"uuid" === "id1").head().getAs[String]("name") == "Francisco")
    // rolling back past the cleaned horizon is refused
    t.compact(); t.clean()
    intercept[IllegalArgumentException](t.rollback(1))
  }

  test("savepoint pins a readable snapshot across clean; restore rolls back to it") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-sp"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")), batchId = 1L)                      // seq 1
    val pin = t.savepoint("v1")
    assert(pin == 1L)
    intercept[IllegalArgumentException](t.savepoint("v1")) // immutable names
    t.upsert(Seq(("id1", "Francisco", 29, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 2L) // seq 2
    t.compact()                                                         // seq 3
    // clean() must NOT remove the savepointed delta even though it is
    // below the compact horizon
    t.clean()
    assert(t.readAt(pin).filter($"uuid" === "id1").head()
      .getAs[String]("name") == "Danny",
      "savepointed time-travel read must survive clean()")
    // restore = rollback to the pin: the newer base goes (the folded
    // seq-2 delta was already cleaned — only the compact instant remains)
    assert(t.restore("v1") == 1)
    assert(t.read().count() == 8)
    assert(t.read().filter($"uuid" === "id1").head().getAs[String]("name") == "Danny")
    assert(t.savepoints() == Map("v1" -> 1L), "the restored-to pin survives")
    // released savepoint stops pinning: next compact+clean removes seq 1
    t.releaseSavepoint("v1")
    t.upsert(Seq(("id2", "Y", 1, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 3L)
    t.compact(); t.clean()
    val e = intercept[Exception](t.readAt(1L).collect())
    assert(e != null, "unpinned horizon is cleanable again")
    assert(t.savepoints().isEmpty)
  }

  test("cleaner removes pre-compaction files; snapshot unaffected") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-clean"), Seq("uuid"),
      compactionDeltaCommits = 2)
    t.upsert(t1Rows, Seq(col("ts")))
    t.upsert(Seq(("id1", "Francisco", 29, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))   // triggers compact
    assert(t.timeline().last.kind == "compact")
    val before = t.read().orderBy("uuid").collect().map(_.toSeq).toSeq
    val removed = t.clean()
    assert(removed == 2) // both pre-compact deltas physically gone
    assert(!new java.io.File(s"${t.path}/delta/1").exists())
    val after = t.read().orderBy("uuid").collect().map(_.toSeq).toSeq
    assert(after == before)
    assert(t.clean() == 0) // idempotent
  }

  test("timeline ops are O(1) instant reads regardless of timeline length") {
    val dir = graft.TestSpark.tmpDir("mor-bigtl")
    // forge a 1000-commit timeline directly (instant files are the contract)
    new java.io.File(s"$dir/timeline").mkdirs()
    for (seq <- 1 to 1000) {
      val i = MorTable.Instant(seq, "delta", seq, 1000L + seq)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/timeline/$seq.delta.json"), i.toJson.getBytes)
    }
    val t = new MorTable(spark, dir, Seq("uuid"), autoCompact = false)
    assert(t.timeline().size == 1000) // cold load parses everything once
    val warmStart = MorTable.instantReads.get()
    assert(t.timeline().size == 1000)
    assert(t.isCommitted(500))
    t.upsert(t1Rows, Seq(col("ts"))) // commit 1001
    assert(t.timeline().size == 1001)
    assert(MorTable.instantReads.get() == warmStart,
      "warm timeline ops and commits must not re-read instant files")
  }

  test("clean archives instants: listing bounded, replay detection survives") {
    val t = MorTable(spark, graft.TestSpark.tmpDir("mor-archive"), Seq("uuid"),
      compactionDeltaCommits = 2)
    t.upsert(t1Rows, Seq(col("ts")), batchId = 7)
    t.upsert(Seq(("id1", "Francisco", 29, "2023-06-15 12:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 8) // → compact
    assert(t.timeline().map(_.kind) == Seq("delta", "delta", "compact"))
    assert(t.clean() == 2)
    assert(t.timeline().map(_.kind) == Seq("compact"), "archived instants must leave the listing")
    assert(t.isCommitted(7) && t.isCommitted(8), "archived batch ids must stay replay-detected")
    // a fresh handle (new JVM analog) sees the same archive
    val t2 = MorTable(spark, t.path, Seq("uuid"))
    assert(t2.isCommitted(7) && t2.isCommitted(8))
    assert(t2.read().count() == 8)
  }

  test("compactMinor: only affected base files rewrite; the rest carry byte-for-byte") {
    import spark.implicits._
    val rows = (1 to 400).map(i => (f"k$i%04d", i.toLong)).toDF("k", "v")
    val t = new MorTable(spark, TestSpark.tmpDir("mor-minor"), Seq("k"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Nil, batchId = 1L)
    t.compact() // 4 range-partitioned files with disjoint key bounds
    // delta touches ONLY the first range (updates) plus one brand-new max key,
    // and deletes one key from the last range
    t.upsert((1 to 50).map(i => (f"k$i%04d", i + 10000L)).toDF("k", "v")
      .unionByName(Seq(("k9999", 1L)).toDF("k", "v")), orderWithinBatch = Nil, batchId = 2L)
    t.delete(Seq("k0399").toDF("k"), batchId = 3L)
    t.compactMinor()
    // correctness: LWW with updates, insert, and delete applied
    val got = t.read().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 400, s"399 survivors + 1 insert, got ${got.size}")
    assert(got("k0001") == 10001L && got("k0050") == 10050L, "first-range updates applied")
    assert(got("k0200") == 200L, "carried rows untouched")
    assert(got("k9999") == 1L, "new key inserted")
    assert(!got.contains("k0399"), "delete folded")
    // write amplification: at least 2 of the 4 files carried (ranges 2 and 3
    // were untouched; range 1 and range 4 — delete + new key — rewrite)
    val tl = t.timeline()
    val baseDir = new java.io.File(s"${t.path}/base/${tl.last.seq}")
    val carried = baseDir.listFiles().count(_.getName.startsWith("carry-"))
    assert(carried >= 2, s"expected >= 2 carried files, got $carried")
    // the carried bytes are identical to the originals (no re-encode)
    val prevBase = new java.io.File(s"${t.path}/base/${tl.filter(_.kind == "compact").head.seq}")
    val prevByName = prevBase.listFiles().map(f => f.getName -> f.length()).toMap
    baseDir.listFiles().filter(_.getName.startsWith("carry-")).foreach { f =>
      val orig = f.getName.replaceFirst("carry-\\d+-", "")
      assert(prevByName(orig) == f.length(), s"carried file size changed: ${f.getName}")
    }
    // post-minor-compaction reads come from the new base only
    assert(t.read().inputFiles.forall(_.contains(s"/base/${tl.last.seq}")))
  }

  test("compactZOrder: multi-column range reads skip files and stay LWW-exact") {
    import spark.implicits._
    // 32x32 grid: keys k0000..k1023, x = row, y = col
    val grid = (0 until 1024).map(i => (f"k$i%04d", (i / 32).toLong, (i % 32).toLong, i.toLong))
      .toDF("k", "x", "y", "v")
    val t = new MorTable(spark, TestSpark.tmpDir("mor-zorder"), Seq("k"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 8)
    t.upsert(grid, orderWithinBatch = Nil, batchId = 1L)
    t.compactZOrder(Seq("x", "y"), bits = 5)
    // a delta on top: moves k0000 (x=0) INTO the query box, k0500 OUT of it
    t.upsert(Seq(("k0000", 20L, 20L, 9999L), ("k0500", 99L, 99L, 8888L))
      .toDF("k", "x", "y", "v"), orderWithinBatch = Nil, batchId = 2L)
    val box = Seq(("x", 8.0, 16.0), ("y", 8.0, 16.0))
    val got = t.readForColRanges(box)
    val want = t.read().filter(col("x") >= 8 && col("x") < 16 && col("y") >= 8 && col("y") < 16)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "z-ordered range read must equal the filtered full read")
    // k0000's new image (20,20) is outside the box; its old in-box image must not resurrect
    assert(got.filter(col("k") === "k0000").isEmpty)
    // file skipping is real: an 8x8 box of a 32x32 z-ordered grid over 8
    // files must not touch all of them
    val touched = got.inputFiles.count(_.contains("/base/"))
    val total = t.read().inputFiles.count(_.contains("/base/"))
    assert(total == 8, s"expected 8 base files, got $total")
    assert(touched < total, s"box read touched all $total base files — no skipping")
    // full-domain read through the same path equals the plain read
    val all = t.readForColRanges(Seq(("x", 0.0, 1000.0)))
    assert(all.count() == t.read().count())
  }

  test("compactMinor after compactZOrder: box reads stay exact, colstats persist") {
    import spark.implicits._
    val grid = (0 until 1024).map(i => (f"k$i%04d", (i / 32).toLong, (i % 32).toLong, i.toLong))
      .toDF("k", "x", "y", "v")
    val t = new MorTable(spark, TestSpark.tmpDir("mor-zminor"), Seq("k"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 8)
    t.upsert(grid, orderWithinBatch = Nil, batchId = 1L)
    t.compactZOrder(Seq("x", "y"), bits = 5)
    // a small corner update, then MINOR compaction (statsCols sticky → the
    // regenerated manifest still carries x/y colstats for every file,
    // carried ones included)
    t.upsert(Seq(("k0000", 9L, 9L, 7777L)).toDF("k", "x", "y", "v"),
      orderWithinBatch = Nil, batchId = 2L)
    t.compactMinor()
    val baseDir = new java.io.File(s"${t.path}/base/${t.timeline().last.seq}")
    assert(baseDir.listFiles().exists(_.getName.startsWith("carry-")),
      "minor compaction after z-order must still find carriable files")
    val box = Seq(("x", 8.0, 16.0), ("y", 8.0, 16.0))
    val got = t.readForColRanges(box)
    val want = t.read().filter(col("x") >= 8 && col("x") < 16 && col("y") >= 8 && col("y") < 16)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.filter(col("k") === "k0000").count() == 1, "moved-in key visible post-minor")
    val touched = got.inputFiles.count(_.contains("/base/"))
    val total = t.read().inputFiles.count(_.contains("/base/"))
    assert(touched < total, s"colstats skipping must survive minor compaction ($touched/$total)")
  }

  test("readForColRanges keeps base files absent from colstats (all-null stat cols)") {
    import spark.implicits._
    // keys 100..199 (string sort = numeric here); the low half has NULL v —
    // the only stats column — but real w values
    val rows = (100 until 200).map { i =>
      (i.toLong, if (i < 150) None else Some(i.toDouble), i.toDouble)
    }.toDF("k", "v", "w")
    val t = new MorTable(spark, TestSpark.tmpDir("mor-nullstats"), Seq("k"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Nil, batchId = 1L)
    t.compactZOrder(Seq("v"), bits = 4) // statsCols = [v]
    // key-clustered recompact: statsCols sticky, but the files holding only
    // null-v rows publish NO colstats rows — they must still be scanned
    t.upsert(Seq((150L, Some(150.0), 150.0)).toDF("k", "v", "w"),
      orderWithinBatch = Nil, batchId = 2L)
    t.compact()
    val got = t.readForColRanges(Seq(("w", 100.0, 150.0)))
    assert(got.count() == 50,
      "rows in stat-less base files must not be silently excluded")
    assert(got.select(sum(col("k"))).head.getLong(0) == (100L until 150L).sum)
  }

  test("z-order colstats survive a fresh handle's plain compaction") {
    import spark.implicits._
    val grid = (0 until 256).map(i => (f"k$i%04d", (i / 16).toLong, (i % 16).toLong))
      .toDF("k", "x", "y")
    val path = TestSpark.tmpDir("mor-zdurable")
    val t = new MorTable(spark, path, Seq("k"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(grid, orderWithinBatch = Nil, batchId = 1L)
    t.compactZOrder(Seq("x", "y"), bits = 4)
    // a FRESH handle (restart analog) compacts WITHOUT knowing the z cols
    val t2 = new MorTable(spark, path, Seq("k"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t2.upsert(Seq(("k0000", 3L, 3L)).toDF("k", "x", "y"), orderWithinBatch = Nil, batchId = 2L)
    t2.compact()
    // the inherited colstats keep the box read pruning on the new base
    val got = t2.readForColRanges(Seq(("x", 4.0, 8.0), ("y", 4.0, 8.0)))
    val want = t2.read().filter(col("x") >= 4 && col("x") < 8 && col("y") >= 4 && col("y") < 8)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val touched = got.inputFiles.count(_.contains("/base/"))
    val total = t2.read().inputFiles.count(_.contains("/base/"))
    assert(touched < total,
      s"fresh-handle compaction must keep publishing colstats ($touched/$total)")
  }

  test("mergeInto: matched update / matched delete / conditional insert in one commit") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-merge"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")), batchId = 1L)
    val src = Seq(
      ("id1", "ignored", 99, "2024-01-01 00:00:00"), // matched, age>50? no → update
      ("id8", "ignored", 1, "2024-01-01 00:00:00"),  // matched, target age 56 → delete
      ("id9", "Nina", 27, "2024-01-01 00:00:00"),    // not matched, age<40 → insert
      ("id10", "Old", 70, "2024-01-01 00:00:00"),    // not matched, age≥40 → dropped
    ).toDF("uuid", "name", "age", "ts")
    t.mergeInto(src,
      matchedSet = Map("age" -> col("s.age"), "name" -> concat(col("t.name"), lit("*"))),
      matchedDelete = Some(col("t.age") > 50),
      insertWhen = col("s.age") < 40,
      batchId = 2L)
    val got = t.read().orderBy("uuid").collect()
      .map(r => (r.getAs[String]("uuid"), r.getAs[String]("name"), r.getAs[Int]("age"))).toSeq
    assert(got.contains(("id1", "Danny*", 99)), "matched row takes source age + tagged name")
    assert(got.contains(("id3", "Julian", 53)), "unmatched target rows are untouched")
    assert(!got.exists(_._1 == "id8"), "matchedDelete tombstones the row")
    assert(got.contains(("id9", "Nina", 27)), "insertWhen admits the new key")
    assert(!got.exists(_._1 == "id10"), "insertWhen filters the other new key")
    assert(got.length == 8, s"7 survivors + 1 insert, got $got")
    // replay: the same batchId is a no-op
    t.mergeInto(src, matchedSet = Map("age" -> lit(0)), batchId = 2L)
    assert(t.read().count() == 8)
  }

  test("mergeInto refuses a key-duplicated source (MERGE cardinality rule)") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-merge-dup"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(t1Rows, Seq(col("ts")))
    val dup = Seq(
      ("id1", "A", 1, "2024-01-01 00:00:00"),
      ("id1", "B", 2, "2024-01-01 00:00:00"),
    ).toDF("uuid", "name", "age", "ts")
    val e = intercept[IllegalArgumentException] {
      t.mergeInto(dup, matchedSet = Map("age" -> col("s.age")))
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("updateWhere: interdependent SET columns see the ORIGINAL row (swap)") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-upd-swap"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(Seq(("id1", 1, 2)).toDF("uuid", "a", "b"), Nil, batchId = 1L)
    // SQL UPDATE semantics: both expressions bind pre-update values — a
    // sequential withColumn fold would produce (2, 2)
    t.updateWhere(col("uuid") === "id1",
      Map("a" -> col("b"), "b" -> col("a")), batchId = 2L)
    val r = t.read().head()
    assert((r.getAs[Int]("a"), r.getAs[Int]("b")) == (2, 1), "SET a=b, b=a must swap")
  }

  test("mergeInto resolves its target through the key-pruned read (bloom file pruning)") {
    val path = TestSpark.tmpDir("mor-merge-prune")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.compact() // 4 base files, per-file key blooms in the manifest
    val src = Seq(("k123", "merged", -5, "1970-01-01 00:00:09"),
      ("knew", "insert", -6, "1970-01-01 00:00:09"))
      .toDF("uuid", "name", "age", "ts")
    // the target side the merge joins against touches only probe-hit
    // FILES — at 100 TB this is the difference between a 2-file point
    // read and a full-snapshot rescan per merge
    val (_, target) = t.mergeTarget(src, "dup")
    val scannedBase = target.inputFiles.count(_.contains("/base/"))
    assert(scannedBase < 4,
      s"merge target scanned $scannedBase of 4 base files — key pruning not applied")
    // and the merge result is exactly the unpruned semantics
    t.mergeInto(src, matchedSet = Map("age" -> col("s.age")), batchId = 2L)
    val got = t.read().collect()
      .map(r => r.getAs[String]("uuid") -> r.getAs[Int]("age")).toMap
    assert(got.size == 401 && got("k123") == -5 && got("knew") == -6 && got("k000") == 0)
    // upsertPartial rides the same pruned target
    t.upsertPartial(Seq(("k200", "patched")).toDF("uuid", "name"), batchId = 3L)
    val k200 = t.read().filter(col("uuid") === "k200").head()
    assert(k200.getAs[String]("name") == "patched" && k200.getAs[Int]("age") == 200)
  }

  test("deleteWhereKeys/updateWhereKeys: key-pruned row ops equal the scan forms") {
    val path = TestSpark.tmpDir("mor-dml-keys")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, orderWithinBatch = Seq(col("ts")), batchId = 1L)
    t.compact() // blooms published — the pruned read touches <4 base files
    t.updateWhereKeys(Seq("k123"), col("uuid") === "k123",
      Map("age" -> lit(-1)), batchId = 2L)
    t.deleteWhereKeys(Seq("k007", "k008"),
      col("uuid").isin("k007", "k008") && col("age") === 7, batchId = 3L)
    val got = t.read().collect()
      .map(r => r.getAs[String]("uuid") -> r.getAs[Int]("age")).toMap
    assert(got.size == 399 && got("k123") == -1 && !got.contains("k007")
      && got("k008") == 8, "extra conjunct must narrow; pruning must not widen")
  }

  test("mergeTarget past the collect cap: scan-and-join, dup check still enforced") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-merge-cap"), Seq("uuid"),
      compactionDeltaCommits = 1000)
    t.upsert(Seq(("k3", 1), ("nope", 2)).toDF("uuid", "v"), Nil, batchId = 1L)
    t.compact() // the key-pruned path engages only once a base exists
    val big = spark.range(0, MorTable.mergeKeyCollectCap + 5)
      .selectExpr("concat('k', id) AS uuid", "CAST(id AS INT) AS v")
    // past the cap the target resolves via the semi-join read — still
    // restricted to the batch's keys
    val (_, tgt) = t.mergeTarget(big, "dupmsg")
    assert(tgt.collect().map(_.getString(0)).toSeq == Seq("k3"))
    // ...and key-distinctness is still enforced on that path
    val dup = big.union(big.limit(1))
    val e = intercept[IllegalArgumentException](t.mergeTarget(dup, "dupmsg"))
    assert(e.getMessage.contains("dupmsg"))
  }

  test("time-trigger compaction fires when the oldest delta is stale") {
    val t = MorTable(spark, TestSpark.tmpDir("mor-time"), Seq("uuid"),
      compactionDeltaCommits = 100, compactionDeltaSeconds = 60)
    t.upsert(t1Rows, Seq(col("ts")))
    assert(!t.maybeCompact()) // fresh — not due
    assert(t.maybeCompact(nowMs = System.currentTimeMillis() + 61000L))
    assert(t.timeline().last.kind == "compact")
  }

  test("readForKeysOf: scan-and-join point read equals the filtered snapshot at any probe size") {
    val path = TestSpark.tmpDir("mor-keysof")
    val rows = (0 until 300)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 4)
    t.upsert(rows, Seq(col("ts")), batchId = 1L)
    t.compact()
    t.upsert(Seq(("k050", "upd", -1, "1970-01-01 00:00:09")).toDF("uuid", "name", "age", "ts"),
      Seq(col("ts")), batchId = 2L)
    t.delete(Seq("k060").toDF("uuid"), batchId = 3L)
    val probe = (0 until 300 by 2).map(i => f"k$i%03d") ++ Seq("nope", "k050", "k060")
    val got = t.readForKeysOf(probe.toDF("uuid"))
      .orderBy("uuid").collect().map(r => (r.getString(0), r.getInt(2))).toSeq
    val want = t.read().filter(col("uuid").isin(probe: _*))
      .orderBy("uuid").collect().map(r => (r.getString(0), r.getInt(2))).toSeq
    assert(got == want)
    assert(got.toMap.get("k050").contains(-1), "delta LWW wins through the join")
    assert(!got.toMap.contains("k060"), "tombstoned key never surfaces")
    // partitioned form
    val pt = new PartitionedMorTable(spark, TestSpark.tmpDir("pmor-keysof"),
      Seq("k"), "p", compactionDeltaCommits = 1000, autoCompact = false)
    pt.upsert((0 until 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i))
      .toDF("k", "p", "v"), Seq(col("v")), batchId = 1L)
    val pGot = pt.readForKeysOf(Seq(2L, 3L, 999L).toDF("k"))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(pGot == Map(2L -> 2, 3L -> 3), pGot)
  }

  test("sharded manifest: large-table probes never materialize per-file stats driver-side") {
    // 8 base files > a threshold of 4 → every pruning probe must take the
    // cluster-side regime: the stats RELATION is filtered by Spark and only
    // pruned file NAMES reach the driver. statsDriverRows (incremented
    // ONLY by the driver-side regime) pins it.
    val path = TestSpark.tmpDir("mor-shard")
    val rows = (0 until 400)
      .map(i => (f"k$i%03d", s"n$i", i, "1970-01-01 00:00:01"))
      .toDF("uuid", "name", "age", "ts")
    val t = new MorTable(spark, path, Seq("uuid"),
      compactionDeltaCommits = 1000, autoCompact = false, writePartitions = 8)
    t.upsert(rows, Seq(col("ts")), batchId = 1L)
    t.indexColumns(Seq("age"))
    t.compact() // 8 range-partitioned base files; stats relation + tiny header
    // the header really is tiny — no per-file payload of any kind
    val hdrFile = new java.io.File(s"$path/manifest/" +
      s"${t.timeline().filter(_.kind == "compact").last.seq}.json")
    assert(hdrFile.length() < 512, s"header not tiny: ${hdrFile.length()} bytes")
    val prev = MorTable.smallManifestFiles
    try {
      MorTable.smallManifestFiles = 4
      val before = MorTable.statsDriverRows.get()
      // bloom point read prunes AND answers exactly
      val one = t.readForKeys(Seq("k123"))
      assert(one.inputFiles.count(_.contains("/base/")) < 8, "bloom pruning dead")
      assert(one.collect().map(r =>
        r.getAs[String]("uuid") -> r.getAs[Int]("age")).toSeq == Seq("k123" -> 123))
      // key-range read prunes
      val narrow = t.readForKeyRange("k040", "k060")
      assert(narrow.inputFiles.count(_.contains("/base/")) < 8, "range pruning dead")
      assert(narrow.count() == 20)
      // secondary-index equality read prunes
      val eq = t.readForColEquals("age", Seq(123))
      assert(eq.inputFiles.count(_.contains("/base/")) < 8, "secondary index dead")
      assert(eq.select("uuid").collect().map(_.getString(0)).toSeq == Seq("k123"))
      // write-path newness proof (probePaths) works in the same regime
      assert(t.upsertIfNew(Seq(("zzz", "new", -1, "1970-01-01 00:00:09"))
        .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 2L))
      assert(!t.upsertIfNew(Seq(("k050", "upd", -2, "1970-01-01 00:00:09"))
        .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 3L))
      // minor compaction plans from the stats relation, still byte-carrying
      t.compactMinor()
      val baseDir = new java.io.File(
        s"$path/base/${t.timeline().filter(_.kind == "compact").last.seq}")
      assert(baseDir.listFiles().count(_.getName.startsWith("carry-")) >= 1,
        "minor compaction stopped carrying in the sharded regime")
      val all = t.read().collect()
        .map(r => r.getAs[String]("uuid") -> r.getAs[Int]("age")).toMap
      assert(all.size == 401 && all("k050") == -2 && all("zzz") == -1)
      assert(MorTable.statsDriverRows.get() == before,
        "large-table path materialized per-file stats driver-side")
    } finally MorTable.smallManifestFiles = prev
    // small-table regime: bounded driver rows, cached across probes
    val b2 = MorTable.statsDriverRows.get()
    t.readForKeys(Seq("k200")).collect()
    val loaded = MorTable.statsDriverRows.get() - b2
    assert(loaded > 0 && loaded <= 16, s"driver rows unbounded: $loaded")
    t.readForKeys(Seq("k300")).collect()
    assert(MorTable.statsDriverRows.get() == b2 + loaded,
      "stats cache miss: second probe re-read the relation")
  }

  test("bootstrap: zero-copy external base — deltas layer, compaction manages, source never touched") {
    val ext = graft.TestSpark.tmpDir("mor-bootstrap-src")
    t1Rows.write.mode("overwrite").parquet(ext)
    def extState() = new java.io.File(ext).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).sortBy(_._1).toSeq
    val before = extState()
    assert(before.nonEmpty)

    val t = MorTable(spark, graft.TestSpark.tmpDir("mor-bootstrap"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.bootstrap(ext, batchId = 1L)
    // one zero-copy instant: no managed base dir was written
    assert(t.timeline().map(_.kind) == Seq("compact"))
    assert(t.timeline().head.bootstrapDir.contains(ext))
    assert(!new java.io.File(s"${t.path}/base").exists(),
      "bootstrap must not copy data into a managed base dir")
    // meta columns synthesized over the external scan
    val snap = t.snapshot().orderBy("uuid").collect()
    assert(snap.length == 8 && snap.head.getAs[String]("_record_key") == "id1")
    assert(t.read().count() == 8)
    // read-optimized == the bootstrap boundary state
    assert(t.readOptimized().orderBy("uuid").collect()
      .map(_.getAs[String]("name")).head == "Danny")
    // exactly-once: a replayed bootstrap batch no-ops
    t.bootstrap(ext, batchId = 1L)
    assert(t.timeline().size == 1)

    // deltas layer on top; point reads work without a manifest
    t.upsert(Seq(("id1", "Updated", 30, "2024-01-01 00:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 2L)
    t.deleteWhere(col("uuid") === "id2")
    assert(t.read().count() == 7)
    val k = t.readForKeys(Seq("id1")).collect()
    assert(k.length == 1 && k.head.getAs[String]("name") == "Updated")

    // first real compaction folds everything managed
    t.compact()
    assert(new java.io.File(s"${t.path}/base").exists())
    val after = t.read().orderBy("uuid").collect()
    assert(after.length == 7 && after.head.getAs[String]("name") == "Updated")
    assert(!after.map(_.getAs[String]("uuid")).contains("id2"))
    assert(extState() == before, "compaction touched the external source dir")

    // refusals: non-empty table, missing source, bad schema
    intercept[IllegalArgumentException](t.bootstrap(ext))
    val t2 = MorTable(spark, graft.TestSpark.tmpDir("mor-bootstrap2"), Seq("uuid"),
      compactionDeltaCommits = 100)
    intercept[IllegalArgumentException](t2.bootstrap(ext + "-nope"))
    val badKey = graft.TestSpark.tmpDir("mor-bootstrap-badkey")
    t1Rows.drop("uuid").write.mode("overwrite").parquet(badKey)
    intercept[IllegalArgumentException](t2.bootstrap(badKey))
    val badMeta = graft.TestSpark.tmpDir("mor-bootstrap-badmeta")
    t1Rows.withColumn("_deleted", lit(false)).write.mode("overwrite").parquet(badMeta)
    intercept[IllegalArgumentException](t2.bootstrap(badMeta))

    // rollback to empty leaves the user's parquet intact
    val n = t.rollback(0L)
    assert(n >= 3)
    intercept[IllegalStateException](t.read().collect())
    assert(extState() == before, "rollback touched the external source dir")
    // and the table is re-bootstrappable afterwards
    t.bootstrap(ext, batchId = 9L)
    assert(t.read().count() == 8)
  }

  test("cloneTo: zero-copy shallow clone — rebased LWW, two-way isolation, pin survives source clean") {
    val src = MorTable(spark, graft.TestSpark.tmpDir("mor-clone-src"), Seq("uuid"),
      compactionDeltaCommits = 100)
    src.upsert(t1Rows, Seq(col("ts")), batchId = 1L)
    // compaction-boundary verb: no base yet → IllegalState
    intercept[IllegalStateException](
      src.cloneTo(graft.TestSpark.tmpDir("mor-clone-x1")))
    src.compact()
    src.deleteWhere(col("uuid") === "id2")
    // live delta above the base → refuse (fold it first)
    intercept[IllegalArgumentException](
      src.cloneTo(graft.TestSpark.tmpDir("mor-clone-x2")))
    src.compact()

    val dstPath = graft.TestSpark.tmpDir("mor-clone-dst")
    val dst = src.cloneTo(dstPath)
    // zero copy: one instant, no managed base dir at the clone
    assert(!new java.io.File(s"$dstPath/base").exists())
    assert(dst.timeline().head.bootstrapMeta)
    // tombstones came through: id2 stays deleted in the clone
    val cloneRows = dst.read().collect().map(_.getAs[String]("uuid")).toSet
    assert(cloneRows == t1Rows.collect().map(_.getString(0)).toSet - "id2")
    // the pin protects the referenced base from source-side clean
    assert(src.savepoints().keys.exists(_.startsWith("clone_")))

    // divergence, clone -> source: the clone's delta must OUTRANK the
    // adopted base rows (seqno rebase), and the source must not see it
    dst.upsert(Seq(("id3", "CloneEdit", 1, "2030-01-01 00:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))
    assert(dst.read().filter(col("uuid") === "id3").head()
      .getAs[String]("name") == "CloneEdit")
    assert(src.read().filter(col("uuid") === "id3").head()
      .getAs[String]("name") == "Julian")
    // divergence, source -> clone
    src.upsert(Seq(("id4", "SrcEdit", 1, "2030-01-01 00:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))
    assert(dst.read().filter(col("uuid") === "id4").head()
      .getAs[String]("name") == "Fabian")

    // source housekeeping cannot break a live clone: new source base +
    // clean() — the clone_<name> pin keeps the referenced base alive
    src.compact()
    src.clean()
    assert(dst.read().count() == 7, "clone must survive source compact+clean")
    // clone's own compaction folds everything managed and drops the
    // source reference; the source files are never written
    dst.compact()
    assert(new java.io.File(s"$dstPath/base").exists())
    assert(dst.read().filter(col("uuid") === "id3").head()
      .getAs[String]("name") == "CloneEdit")
    assert(dst.read().count() == 7)
  }

  test("cloneTo at a bootstrap boundary: forwarded external reference, no pin, independent divergence") {
    val ext = graft.TestSpark.tmpDir("mor-cob-ext")
    t1Rows.write.mode("overwrite").parquet(ext)
    val extBefore = spark.read.parquet(ext).collect().toSet
    val src = MorTable(spark, graft.TestSpark.tmpDir("mor-cob-src"), Seq("uuid"),
      compactionDeltaCommits = 100)
    src.bootstrap(ext, batchId = 1L)
    // onboard → immediately branch a dev copy: no 100 TB compact needed
    val dstPath = graft.TestSpark.tmpDir("mor-cob-dst")
    val dst = src.cloneTo(dstPath)
    // the clone is an independent bootstrap of the same user-owned dir:
    // zero-copy, and NO pin (external dirs are never cleaned source-side)
    assert(!new java.io.File(s"$dstPath/base").exists())
    assert(dst.timeline().head.bootstrapDir.contains(ext))
    assert(src.savepoints().isEmpty, "bootstrap-boundary clone needs no pin")
    assert(dst.read().count() == 8)
    // two-way divergence isolation, straight off the shared reference
    dst.upsert(Seq(("id1", "CloneEdit", 1, "2030-01-01 00:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")))
    src.deleteWhere(col("uuid") === "id2")
    assert(dst.read().filter(col("uuid") === "id1").head()
      .getAs[String]("name") == "CloneEdit")
    assert(src.read().filter(col("uuid") === "id1").head()
      .getAs[String]("name") == "Danny")
    assert(dst.read().count() == 8 && src.read().count() == 7)
    // both sides compact managed; the external dir is never touched
    src.compact(); dst.compact()
    assert(spark.read.parquet(ext).collect().toSet == extBefore)
    // a bootstrap base WITH live deltas still refuses (boundary verb)
    val src2 = MorTable(spark, graft.TestSpark.tmpDir("mor-cob-src2"), Seq("uuid"),
      compactionDeltaCommits = 100)
    src2.bootstrap(ext)
    src2.deleteWhere(col("uuid") === "id3")
    intercept[IllegalArgumentException](
      src2.cloneTo(graft.TestSpark.tmpDir("mor-cob-x")))
    // clone-of-CLONE stays refused (would need a cross-table pin)
    val c1 = src.cloneTo(graft.TestSpark.tmpDir("mor-cob-c1"))
    val e = intercept[IllegalArgumentException](
      c1.cloneTo(graft.TestSpark.tmpDir("mor-cob-c2")))
    assert(e.getMessage.contains("CLONE base"), e.getMessage)
  }

  test("cloneTo retry after source advance never releases the live clone's pin") {
    val src = MorTable(spark, graft.TestSpark.tmpDir("mor-clone-pin-src"), Seq("uuid"),
      compactionDeltaCommits = 100)
    src.upsert(t1Rows, Seq(col("ts")), batchId = 1L)
    src.compact()
    val dstPath = graft.TestSpark.tmpDir("mor-clone-pin-dst")
    val dst = src.cloneTo(dstPath)
    val pin = src.savepoints().keys.find(_.startsWith("clone_")).get
    val pinnedSeq = src.savepoints()(pin)
    // the source advances past the cloned base...
    src.upsert(Seq(("id9", "Late", 1, "2030-01-01 00:00:00"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 2L)
    src.compact()
    // ...then someone re-runs the same clone command: it must refuse WITHOUT
    // releasing the earlier clone's pin (the pin is that clone's only
    // protection from source-side clean)
    val e = intercept[IllegalStateException](src.cloneTo(dstPath))
    assert(e.getMessage.contains("distinct dst name"))
    assert(src.savepoints().get(pin).contains(pinnedSeq),
      "failed clone retry released the live clone's pin")
    src.clean()
    assert(dst.read().count() == 8, "live clone lost its base to source clean()")
  }

  test("savepoint-TTL housekeeping exempts clone_ pins unless opted in") {
    val src = MorTable(spark, graft.TestSpark.tmpDir("mor-ttl-src"), Seq("uuid"),
      compactionDeltaCommits = 100)
    src.upsert(t1Rows, Seq(col("ts")), batchId = 1L)
    src.compact()
    src.cloneTo(graft.TestSpark.tmpDir("mor-ttl-dst"))
    src.savepoint("adhoc")
    val far = System.currentTimeMillis() + 3600000L
    // everything is "older than 1ms" at the fake now — only adhoc goes
    val released = src.releaseSavepointsOlderThan(1L, nowMs = far)
    assert(released == Seq("adhoc"))
    assert(src.savepoints().keys.exists(_.startsWith("clone_")),
      "TTL sweep collected a live clone's pin")
    // explicit opt-in still allows collecting clone pins
    val released2 = src.releaseSavepointsOlderThan(1L, nowMs = far,
      includeClonePins = true)
    assert(released2.exists(_.startsWith("clone_")))
  }

  test("readQuarantine merges quarantine vintages (_batch never disappears)") {
    val t = MorTable(spark, graft.TestSpark.tmpDir("mor-quar-merge"), Seq("uuid"),
      compactionDeltaCommits = 100)
      .withExpectations(Seq(("age_pos", col("age") >= 0)), "quarantine")
    t.upsert(t1Rows, Seq(col("ts")), batchId = 1L)
    t.upsert(Seq(("idq", "Bad", -1, "1970-01-01 00:00:09"))
      .toDF("uuid", "name", "age", "ts"), Seq(col("ts")), batchId = 5L)
    // simulate a pre-upgrade quarantine file that predates the _batch column
    Seq(("idold", "OldBad", -2, "1970-01-01 00:00:10", "age_pos", "20240101000000"))
      .toDF("uuid", "name", "age", "ts", "_rule", "_qtime")
      .write.mode("append").parquet(s"${t.path}/quarantine")
    val q = t.readQuarantine()
    assert(q.columns.contains("_batch"),
      "schema resolution dropped _batch (file-listing-order dependent)")
    assert(q.count() == 2)
    assert(q.filter(col("_batch") === 5L).count() == 1)
    assert(q.filter(col("_batch").isNull).count() == 1,
      "pre-upgrade rows read back with null _batch")
  }
}
