package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.lake.MorTable

/** S5 catalog DDL over MOR tables + T5 write-parallelism controls. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S5: register → SQL query → DROP TABLE IF EXISTS is idempotent") {
    val t = MorTable(spark, TestSpark.tmpDir("cat-t1"), Seq("uuid"),
      compactionDeltaCommits = 100)
    t.upsert(Seq(("id1", "Danny", 23)).toDF("uuid", "name", "age"), Seq(col("uuid")))
    GraftCatalog.register(spark, "t1_cat", t)
    assert(spark.sql("SELECT name FROM t1_cat WHERE uuid = 'id1'")
      .head().getString(0) == "Danny")
    GraftCatalog.dropTable(spark, "t1_cat")
    GraftCatalog.dropTable(spark, "t1_cat") // IF EXISTS semantics: no throw
    assert(!GraftCatalog.exists(spark, "t1_cat"))
    // purge drops storage too
    GraftCatalog.register(spark, "t1_cat", t)
    GraftCatalog.dropTable(spark, "t1_cat", Some(t), purge = true)
    assert(!new java.io.File(t.path).exists())
  }

  test("T5: writePartitions controls files per commit (write.tasks analog)") {
    val t = new MorTable(spark, TestSpark.tmpDir("cat-wp"), Seq("k"),
      compactionDeltaCommits = 100, writePartitions = 3)
    t.upsert((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"), Seq(col("v")))
    val files = new java.io.File(s"${t.path}/delta/1").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 3, s"expected 3 parquet files, got $files")
    assert(t.read().count() == 100)
  }
}
