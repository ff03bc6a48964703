package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.lake.MorTable

/** Materialized-view auto-substitution guards: the rewrite fires ONLY on
  * the exact registered shape, a fresh view, and an enabled session —
  * every other query keeps the base scan AND its correct answer (the
  * fail-closed contract; the happy path is additionally asserted in-plan
  * inside the s81 gate entry). */
class ViewRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def servedFromView(df: org.apache.spark.sql.DataFrame,
                             viewPath: String): Boolean =
    df.queryExecution.executedPlan.toString().contains(viewPath)

  test("exact-shape rewrite; every deviation fails closed with the scan answer") {
    val basePath = TestSpark.tmpDir("mv-base")
    val viewPath = TestSpark.tmpDir("mv-view")
    val bt = MorTable(spark, basePath, Seq("k"), compactionDeltaCommits = 100)
    bt.upsert(Seq(("k1", "a", "x", 10L), ("k2", "a", "y", 20L),
      ("k3", "b", "x", 5L), ("k4", "a", "x", 2L))
      .toDF("k", "g", "h", "v"), Seq(col("v")), batchId = 1L)
    // view grouping is FINER than (g): (g, h) — exact queries project,
    // coarser queries roll up
    val vt = MorTable(spark, viewPath, Seq("g", "h"), compactionDeltaCommits = 100)
    vt.upsert(bt.read().groupBy("g", "h")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")),
      orderWithinBatch = Nil, batchId = 1L)
    val fresh = new java.util.concurrent.atomic.AtomicBoolean(true)
    ViewRewrite.register(ViewRewrite.ViewDef(basePath, Seq("g", "h"),
      Seq(ViewRewrite.Measure("count", "", "n"),
        ViewRewrite.Measure("sum", "v", "sv")),
      () => vt.read(), () => fresh.get()))
    spark.sql("DROP TABLE IF EXISTS mv_t")
    spark.sql(s"CREATE TABLE mv_t USING `graft.mor` OPTIONS " +
      s"(path '$basePath', keys 'k')")
    def q(sql: String) = spark.sql(sql)
    val exact = "SELECT g, h, count(*) AS n, sum(v) AS sv FROM mv_t GROUP BY g, h"
    val coarse = "SELECT g, count(*) AS n, sum(v) AS sv FROM mv_t GROUP BY g"
    val truth = Set(("a", "x", 2L, 12L), ("a", "y", 1L, 20L), ("b", "x", 1L, 5L))
    val coarseTruth = Set(("a", 3L, 32L), ("b", 1L, 5L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    def rows3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    try {
      // OFF by default: no substitution even with a registered fresh view
      assert(!servedFromView(q(exact), viewPath))
      spark.conf.set(ViewRewrite.confKey, "true")
      // the exact registered shape serves from the view (pure projection)
      assert(servedFromView(q(exact), viewPath))
      assert(rows(q(exact)) == truth)
      // a COARSER grouping rolls up over the groups-sized view
      assert(servedFromView(q(coarse), viewPath))
      assert(rows3(q(coarse)) == coarseTruth)
      // any shape deviation keeps the scan — and the right answer
      val deviations = Seq(
        // a filter the view cannot see
        "SELECT g, count(*) AS n, sum(v) AS sv FROM mv_t WHERE v > 6 GROUP BY g",
        // DISTINCT aggregate
        "SELECT g, count(DISTINCT v) AS n, sum(v) AS sv FROM mv_t GROUP BY g",
        // a measure the view does not declare
        "SELECT g, count(*) AS n, max(v) AS sv FROM mv_t GROUP BY g",
        // derived grouping
        "SELECT upper(g) AS g, count(*) AS n FROM mv_t GROUP BY upper(g)",
        // wrong grouping column
        "SELECT k, count(*) AS n FROM mv_t GROUP BY k",
        // derived aggregate argument
        "SELECT g, sum(v + 1) AS sv FROM mv_t GROUP BY g")
      deviations.foreach { sql =>
        val df = q(sql)
        assert(!servedFromView(df, viewPath), s"must fail closed: $sql")
        assert(df.count() > 0)
      }
      // a SUBSET of measures still rewrites (the view answers it)
      assert(servedFromView(q("SELECT g, sum(v) AS sv FROM mv_t GROUP BY g"),
        viewPath))
      // no GROUP BY: the grouping-free shape stays with the scan (an
      // empty view would answer NULL where the scan answers 0)
      assert(!servedFromView(
        q("SELECT count(*) AS n, sum(v) AS sv FROM mv_t"), viewPath))
      // staleness flips the same query back to the scan
      fresh.set(false)
      assert(!servedFromView(q(exact), viewPath))
      assert(rows(q(exact)) == truth)
      assert(!servedFromView(q(coarse), viewPath))
      // unregistering removes the route entirely
      fresh.set(true)
      ViewRewrite.unregister(basePath)
      assert(!servedFromView(q(exact), viewPath))
    } finally {
      ViewRewrite.unregister(basePath)
      spark.conf.unset(ViewRewrite.confKey)
      spark.sql("DROP TABLE IF EXISTS mv_t")
    }
  }
}
