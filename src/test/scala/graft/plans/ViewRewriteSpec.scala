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

  test("min/max/avg measures: exact + rollup forms, null-aware avg — " +
      "bit-identical to the scan") {
    val basePath = TestSpark.tmpDir("mv2-base")
    val viewPath = TestSpark.tmpDir("mv2-view")
    val bt = MorTable(spark, basePath, Seq("k"), compactionDeltaCommits = 100)
    // v carries a NULL: avg(v)/count(v) must use the non-null count, not n
    bt.upsert(Seq(("k1", "a", "x", Some(10L)), ("k2", "a", "x", None),
      ("k3", "a", "y", Some(30L)), ("k4", "b", "x", Some(7L)))
      .toDF("k", "g", "h", "v"), Seq(col("k")), batchId = 1L)
    val vt = MorTable(spark, viewPath, Seq("g", "h"), compactionDeltaCommits = 100)
    vt.upsert(bt.read().groupBy("g", "h")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
        count(col("v")).as("cnt_v"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v")),
      orderWithinBatch = Nil, batchId = 1L)
    ViewRewrite.register(ViewRewrite.ViewDef(basePath, Seq("g", "h"),
      Seq(ViewRewrite.Measure("count", "", "n"),
        ViewRewrite.Measure("count", "v", "cnt_v"),
        ViewRewrite.Measure("sum", "v", "sum_v"),
        ViewRewrite.Measure("min", "v", "min_v"),
        ViewRewrite.Measure("max", "v", "max_v"),
        ViewRewrite.Measure("avg", "v", "sum_v", "cnt_v")),
      () => vt.read(), () => true))
    spark.sql("DROP TABLE IF EXISTS mv2_t")
    spark.sql(s"CREATE TABLE mv2_t USING `graft.mor` OPTIONS " +
      s"(path '$basePath', keys 'k')")
    val queries = Seq(
      // exact grouping: projection (avg recombines sum/cnt in-place)
      "SELECT g, h, count(*) AS n, count(v) AS c, avg(v) AS av, " +
        "min(v) AS mn, max(v) AS mx FROM mv2_t GROUP BY g, h",
      // subset grouping: rollup (min re-mins, avg = sum(sum)/sum(cnt))
      "SELECT g, count(*) AS n, count(v) AS c, avg(v) AS av, " +
        "min(v) AS mn, max(v) AS mx, sum(v) AS sv FROM mv2_t GROUP BY g")
    try {
      queries.foreach { sql =>
        spark.conf.unset(ViewRewrite.confKey)
        val truth = spark.sql(sql).collect().map(_.toSeq).toSet
        spark.conf.set(ViewRewrite.confKey, "true")
        val served = spark.sql(sql)
        assert(servedFromView(served, viewPath), s"must serve from view: $sql")
        assert(served.collect().map(_.toSeq).toSet == truth,
          s"view answer must equal scan answer: $sql")
      }
      // sanity on the null-aware numbers: group a has v ∈ {10, null, 30}
      val a = spark.sql("SELECT count(*) AS n, count(v) AS c, avg(v) AS av " +
        "FROM mv2_t WHERE g = 'a' GROUP BY g")
      // (WHERE g='a' disables the rewrite — scan truth): n=3, c=2, av=20.0
      assert(a.collect().head.toSeq == Seq(3L, 2L, 20.0))
      val aServed = spark.sql(
        "SELECT g, count(*) AS n, count(v) AS c, avg(v) AS av FROM mv2_t GROUP BY g")
      assert(servedFromView(aServed, viewPath))
      assert(aServed.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getDouble(3))).toSet ==
        Set(("a", 3L, 2L, 20.0), ("b", 1L, 1L, 7.0)))
    } finally {
      ViewRewrite.unregister(basePath)
      spark.conf.unset(ViewRewrite.confKey)
      spark.sql("DROP TABLE IF EXISTS mv2_t")
    }
  }

  test("policy relations never serve from a view; HAVING/ORDER BY compose " +
      "over the substituted plan") {
    val basePath = TestSpark.tmpDir("mv5-base")
    val viewPath = TestSpark.tmpDir("mv5-view")
    val bt = MorTable(spark, basePath, Seq("k"), compactionDeltaCommits = 100)
    bt.upsert(Seq(("k1", "a", 10L), ("k2", "a", 20L), ("k3", "b", 5L))
      .toDF("k", "g", "v"), Seq(col("k")), batchId = 1L)
    val vt = MorTable(spark, viewPath, Seq("g"), compactionDeltaCommits = 100)
    vt.upsert(bt.read().groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")),
      orderWithinBatch = Nil, batchId = 1L)
    ViewRewrite.register(ViewRewrite.ViewDef(basePath, Seq("g"),
      Seq(ViewRewrite.Measure("count", "", "n"),
        ViewRewrite.Measure("sum", "v", "sv")),
      () => vt.read(), () => true))
    spark.sql("DROP TABLE IF EXISTS mv5_t")
    spark.sql("DROP TABLE IF EXISTS mv5_pol")
    spark.sql(s"CREATE TABLE mv5_t USING `graft.mor` OPTIONS " +
      s"(path '$basePath', keys 'k')")
    // SAME base path behind an access policy: masks/row filters change
    // the very values the view aggregated — must NEVER serve from it
    spark.sql(s"CREATE TABLE mv5_pol USING `graft.mor` OPTIONS " +
      s"(path '$basePath', keys 'k', 'filter.where'='v > 6')")
    try {
      spark.conf.set(ViewRewrite.confKey, "true")
      val pol = spark.sql(
        "SELECT g, count(*) AS n, sum(v) AS sv FROM mv5_pol GROUP BY g")
      assert(!servedFromView(pol, viewPath),
        "a policy relation must fail closed out of the MV rewrite")
      assert(pol.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet == Set(("a", 2L, 30L)), "and answer under the row filter")
      // HAVING and ORDER BY sit ABOVE the substituted aggregate: parents
      // re-resolve against the view projection (preserved exprIds)
      val having = spark.sql("SELECT g, count(*) AS n, sum(v) AS sv " +
        "FROM mv5_t GROUP BY g HAVING sum(v) > 6 ORDER BY sv DESC")
      assert(servedFromView(having, viewPath),
        "HAVING/ORDER BY over the registered shape still serves")
      assert(having.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 2L, 30L)), "HAVING filters on the substituted measure")
    } finally {
      ViewRewrite.unregister(basePath)
      spark.conf.unset(ViewRewrite.confKey)
      spark.sql("DROP TABLE IF EXISTS mv5_t")
      spark.sql("DROP TABLE IF EXISTS mv5_pol")
    }
  }

  test("multiple views per base: shape routes to the right view, exact beats rollup") {
    val basePath = TestSpark.tmpDir("mv4-base")
    val coarsePath = TestSpark.tmpDir("mv4-coarse")
    val finePath = TestSpark.tmpDir("mv4-fine")
    val bt = MorTable(spark, basePath, Seq("k"), compactionDeltaCommits = 100)
    bt.upsert(Seq(("k1", "a", "x", 10L), ("k2", "a", "y", 20L),
      ("k3", "b", "x", 5L)).toDF("k", "g", "h", "v"),
      Seq(col("k")), batchId = 1L)
    val coarse = MorTable(spark, coarsePath, Seq("g"), compactionDeltaCommits = 100)
    coarse.upsert(bt.read().groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")),
      orderWithinBatch = Nil, batchId = 1L)
    val fine = MorTable(spark, finePath, Seq("g", "h"), compactionDeltaCommits = 100)
    fine.upsert(bt.read().groupBy("g", "h")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")),
      orderWithinBatch = Nil, batchId = 1L)
    def reg(name: String, path: String, t: MorTable, cols: Seq[String]): Unit =
      ViewRewrite.register(ViewRewrite.ViewDef(basePath, cols,
        Seq(ViewRewrite.Measure("count", "", "n"),
          ViewRewrite.Measure("sum", "v", "sv")),
        () => t.read(), () => true, name = name))
    reg("coarse", coarsePath, coarse, Seq("g"))
    reg("fine", finePath, fine, Seq("g", "h"))
    spark.sql("DROP TABLE IF EXISTS mv4_t")
    spark.sql(s"CREATE TABLE mv4_t USING `graft.mor` OPTIONS " +
      s"(path '$basePath', keys 'k')")
    val byG = "SELECT g, count(*) AS n, sum(v) AS sv FROM mv4_t GROUP BY g"
    val byGH = "SELECT g, h, count(*) AS n, sum(v) AS sv FROM mv4_t GROUP BY g, h"
    try {
      spark.conf.set(ViewRewrite.confKey, "true")
      // exact match beats the other view's rollup, per query
      assert(servedFromView(spark.sql(byG), coarsePath),
        "g-grouping routes to the g view (exact over rollup)")
      assert(servedFromView(spark.sql(byGH), finePath),
        "(g,h)-grouping routes to the (g,h) view")
      val gTruth = Set(("a", 2L, 30L), ("b", 1L, 5L))
      assert(spark.sql(byG).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == gTruth)
      // dropping ONE view keeps the other registered; the g query now
      // ROLLS UP over the (g,h) view — same answer
      ViewRewrite.unregister(basePath, "coarse")
      assert(servedFromView(spark.sql(byG), finePath),
        "with the exact view gone, g-grouping rolls up over the fine view")
      assert(spark.sql(byG).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == gTruth)
      // full unregister removes every route
      ViewRewrite.unregister(basePath)
      assert(!servedFromView(spark.sql(byG), finePath))
      assert(!servedFromView(spark.sql(byGH), finePath))
    } finally {
      ViewRewrite.unregister(basePath)
      spark.conf.unset(ViewRewrite.confKey)
      spark.sql("DROP TABLE IF EXISTS mv4_t")
    }
  }

  test("analyzed view plan caches per version token: one analysis per view commit") {
    val basePath = TestSpark.tmpDir("mv3-base")
    val viewPath = TestSpark.tmpDir("mv3-view")
    val bt = MorTable(spark, basePath, Seq("k"), compactionDeltaCommits = 100)
    bt.upsert(Seq(("k1", "a", 10L), ("k2", "b", 20L)).toDF("k", "g", "v"),
      Seq(col("k")), batchId = 1L)
    val vt = MorTable(spark, viewPath, Seq("g"), compactionDeltaCommits = 100)
    vt.upsert(bt.read().groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")),
      orderWithinBatch = Nil, batchId = 1L)
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val version = new java.util.concurrent.atomic.AtomicLong(1L)
    ViewRewrite.register(ViewRewrite.ViewDef(basePath, Seq("g"),
      Seq(ViewRewrite.Measure("count", "", "n"),
        ViewRewrite.Measure("sum", "v", "sv")),
      () => { scans.incrementAndGet(); vt.read() },
      () => true, () => version.get()))
    spark.sql("DROP TABLE IF EXISTS mv3_t")
    spark.sql(s"CREATE TABLE mv3_t USING `graft.mor` OPTIONS " +
      s"(path '$basePath', keys 'k')")
    val sql = "SELECT g, count(*) AS n, sum(v) AS sv FROM mv3_t GROUP BY g"
    try {
      spark.conf.set(ViewRewrite.confKey, "true")
      assert(servedFromView(spark.sql(sql), viewPath))
      val afterFirst = scans.get()
      assert(afterFirst >= 1)
      // identical queries at the same version reuse the cached plan —
      // ZERO further analyses (the dashboard-storm scenario)
      (1 to 5).foreach(_ => assert(servedFromView(spark.sql(sql), viewPath)))
      assert(scans.get() == afterFirst,
        s"repeat queries must not re-analyze (${scans.get()} vs $afterFirst)")
      assert(ViewRewrite.cachedPlanVersion(basePath).contains(1L))
      // a maintenance commit bumps the version → exactly one re-analysis
      version.set(2L)
      assert(servedFromView(spark.sql(sql), viewPath))
      assert(scans.get() == afterFirst + 1, "version bump must re-analyze once")
      assert(servedFromView(spark.sql(sql), viewPath))
      assert(scans.get() == afterFirst + 1)
      assert(ViewRewrite.cachedPlanVersion(basePath).contains(2L))
    } finally {
      ViewRewrite.unregister(basePath)
      spark.conf.unset(ViewRewrite.confKey)
      spark.sql("DROP TABLE IF EXISTS mv3_t")
    }
  }
}
