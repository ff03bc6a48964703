package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.{MorTable, PartitionedMorTable}

/** Metadata-only COUNT(*) ([[MetadataCountRewrite]]): a grouping-free
  * count over a plain mor snapshot at a clean boundary collapses to a
  * LocalRelation read from the manifest header — and fails CLOSED back to
  * the scan the moment the metadata cannot prove the answer. */
class MetadataCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def isMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    !df.queryExecution.optimizedPlan.exists {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }

  test("count(*) collapses to the manifest header at a clean boundary; fails closed otherwise") {
    val path = TestSpark.tmpDir("meta-count")
    val t = new MorTable(spark, path, Seq("uuid"), compactionDeltaCommits = 100,
      autoCompact = false)
    t.upsert(Seq(("id1", 1), ("id2", 2), ("id3", 3)).toDF("uuid", "v"),
      Seq(col("v")), batchId = 1L)
    // the rewrite targets the graft.mor relation (the SQL catalog surface)
    spark.sql("DROP TABLE IF EXISTS meta_count_t")
    spark.sql(s"CREATE TABLE meta_count_t USING `graft.mor` OPTIONS " +
      s"(path '$path', keys 'uuid')")
    def count() = spark.sql("SELECT count(*) AS n FROM meta_count_t")
    // live delta, no manifest: the scan answers (fail closed)
    assert(!isMetadataOnly(count()) && count().head().getLong(0) == 3)
    // clean boundary: metadata-only, no relation in the optimized plan
    t.compact()
    assert(count().head().getLong(0) == 3)
    assert(isMetadataOnly(count()),
      "boundary count(*) must collapse to the manifest header")
    // tombstones must not inflate the metadata answer (live rows only)
    t.deleteWhere(col("uuid") === "id2")
    assert(!isMetadataOnly(count()), "a live delta disables the rewrite")
    assert(count().head().getLong(0) == 2)
    t.compact() // base retains the tombstone row; liveRows excludes it
    assert(isMetadataOnly(count()) && count().head().getLong(0) == 2)
    // guards: count(col) (null-skipping), filters, grouping → scan
    assert(!isMetadataOnly(spark.sql(
      "SELECT count(v) AS n FROM meta_count_t")))
    assert(!isMetadataOnly(spark.sql(
      "SELECT count(*) AS n FROM meta_count_t WHERE v > 1")))
    assert(!isMetadataOnly(spark.sql(
      "SELECT uuid, count(*) AS n FROM meta_count_t GROUP BY uuid")))
    // count(1) and multiple count columns are all the total
    val multi = spark.sql("SELECT count(*) AS a, count(1) AS b FROM meta_count_t")
    assert(isMetadataOnly(multi) && multi.head().toSeq == Seq(2L, 2L))
  }

  test("partitioned count(*): every child must sit at a boundary; pruned counts stay exact") {
    val path = TestSpark.tmpDir("meta-count-part")
    val p = new PartitionedMorTable(spark, path, Seq("k"), "pt",
      compactionDeltaCommits = 100, autoCompact = false)
    p.upsert(Seq((1L, "a", 1), (2L, "a", 2), (3L, "b", 3)).toDF("k", "pt", "v"),
      Seq(col("v")), batchId = 1L)
    spark.sql("DROP TABLE IF EXISTS meta_count_p")
    spark.sql(s"CREATE TABLE meta_count_p USING `graft.mor` OPTIONS " +
      s"(path '$path', keys 'k', partition 'pt')")
    def count() = spark.sql("SELECT count(*) AS n FROM meta_count_p")
    assert(!isMetadataOnly(count()) && count().head().getLong(0) == 3)
    p.compactPartitions(Seq("a")) // child b not at a boundary → scan
    assert(!isMetadataOnly(count()) && count().head().getLong(0) == 3)
    p.compactPartitions(Seq("b"))
    assert(isMetadataOnly(count()) && count().head().getLong(0) == 3)
    // a new delta on ONE child reverts to the scan; recompact restores
    p.delete(Seq((1L, "a")).toDF("k", "pt"), batchId = 2L)
    assert(!isMetadataOnly(count()) && count().head().getLong(0) == 2)
    p.compactPartitions(Seq("a"))
    assert(isMetadataOnly(count()) && count().head().getLong(0) == 2)
    // partition-PRUNED counts answer from the pinned children's headers
    def q(sql: String) = spark.sql(sql)
    val eq = q("SELECT count(*) AS n FROM meta_count_p WHERE pt = 'b'")
    assert(isMetadataOnly(eq) && eq.head().getLong(0) == 1)
    val in = q("SELECT count(*) AS n FROM meta_count_p WHERE pt IN ('a','b','zz')")
    assert(isMetadataOnly(in) && in.head().getLong(0) == 2,
      "missing partitions contribute exact 0, never a scan fallback")
    val none = q("SELECT count(*) AS n FROM meta_count_p WHERE pt = 'zz'")
    assert(isMetadataOnly(none) && none.head().getLong(0) == 0)
    // residual predicates / OR-trees / non-partition pins fail closed
    assert(!isMetadataOnly(q(
      "SELECT count(*) AS n FROM meta_count_p WHERE pt = 'a' AND v > 0")))
    assert(!isMetadataOnly(q(
      "SELECT count(*) AS n FROM meta_count_p WHERE pt = 'a' OR v > 99")))
    assert(!isMetadataOnly(q(
      "SELECT count(*) AS n FROM meta_count_p WHERE k = 2")))
    assert(q("SELECT count(*) AS n FROM meta_count_p WHERE pt = 'a' AND v > 0")
      .head().getLong(0) == 1)
  }

  test("exactLiveRowCount: direct contract, both forms") {
    val t = new MorTable(spark, TestSpark.tmpDir("meta-count-api"), Seq("k"),
      compactionDeltaCommits = 100, autoCompact = false)
    assert(t.exactLiveRowCount().isEmpty, "empty table: loud reads, no count")
    t.upsert(Seq((1L, 1), (2L, 2)).toDF("k", "v"), Seq(col("v")), batchId = 1L)
    assert(t.exactLiveRowCount().isEmpty, "live delta: fail closed")
    t.compact()
    assert(t.exactLiveRowCount().contains(2L))
    // a bootstrap base has no manifest: fail closed
    val ext = TestSpark.tmpDir("meta-count-ext")
    Seq((1L, 1)).toDF("k", "v").write.mode("overwrite").parquet(ext)
    val b = new MorTable(spark, TestSpark.tmpDir("meta-count-boot"), Seq("k"),
      compactionDeltaCommits = 100, autoCompact = false)
    b.bootstrap(ext)
    assert(b.exactLiveRowCount().isEmpty, "bootstrap base: fail closed")
  }
}
