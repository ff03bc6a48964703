package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trades = Seq(
    (1L, 10L, "t-early"), (1L, 50L, "t-mid"), (1L, 100L, "t-late"),
    (2L, 5L, "t-nomatch"), (3L, 40L, "t-eq")
  ).toDF("t_key", "t_ts", "t_tag")

  private def quotes = Seq(
    (1L, 20L, 1L, 2.0), (1L, 50L, 2L, 5.0), (1L, 50L, 3L, 5.5), (1L, 90L, 4L, 9.0),
    (2L, 7L, 5L, 0.7), (3L, 40L, 6L, 4.0)
  ).toDF("q_key", "q_ts", "q_id", "q_px")

  test("inner as-of: latest quote at-or-before each trade; ties break by max id") {
    val out = AsOfJoin.asOf(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        rightTieBreak = Seq("q_ts", "q_id"))
      .select("t_tag", "q_id", "q_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(
      // t-early (ts 10): no quote <= 10 for key 1 → dropped (inner)
      ("t-mid", 3L, 5.5),   // ts 50 inclusive; (50, id 3) beats (50, id 2)
      ("t-late", 4L, 9.0),  // latest <= 100
      ("t-eq", 6L, 4.0)))   // equal ts on another key, inclusive
  }

  test("forward as-of: earliest quote at-or-after each trade; ties break by min id") {
    val out = AsOfJoin.asOf(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        rightTieBreak = Seq("q_ts", "q_id"), direction = "forward")
      .select("t_tag", "q_id", "q_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(
      ("t-early", 1L, 2.0),   // first quote >= 10 is (20, id 1)
      ("t-mid", 2L, 5.0),     // ts 50 inclusive; MIN tie (50, id 2) wins
      ("t-nomatch", 5L, 0.7), // key 2: quote at 7 >= 5
      ("t-eq", 6L, 4.0)))     // equal ts inclusive
    // t-late (ts 100): no quote at-or-after → dropped (inner)
    // left form keeps it with nulls
    val left = AsOfJoin.asOf(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        rightTieBreak = Seq("q_ts", "q_id"), joinType = "left",
        direction = "forward")
    assert(left.filter(col("q_id").isNull)
      .select("t_tag").as[String].collect().toSeq == Seq("t-late"))
  }

  test("left as-of keeps unmatched rows with null quote columns") {
    val out = AsOfJoin.asOf(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        rightTieBreak = Seq("q_ts", "q_id"), joinType = "left")
    assert(out.count() == 5)
    val unmatched = out.filter(col("q_id").isNull)
      .select("t_tag").as[String].collect().toSet
    // t-early: quote exists but later; t-nomatch: key 2's only quote is at ts 7 > 5
    assert(unmatched == Set("t-early", "t-nomatch"))
  }

  test("matches the quadratic join+window oracle on real events data") {
    val got = RelationalOps.asofPurchaseClick(spark, TestSpark.sfDir)
    val ev = graft.Tables.events(spark, TestSpark.sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts_ns").as("p_ns"), col("ts_ms").as("p_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_event_id"),
        col("ts_ns").as("c_ns"), col("ts_ms").as("c_ms"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_event_id")).orderBy(col("c_ns").desc, col("c_event_id").desc)
    val oracle = p.join(c, col("c_user") === col("user_id") && col("c_ns") <= col("p_ns"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("user_id", "p_event_id", "p_ms", "c_event_id", "c_ms")
    assert(got.count() === oracle.count())
    assert(got.exceptAll(oracle).isEmpty && oracle.exceptAll(got).isEmpty)
  }

  test("plans one shuffle over the union — no join operator at all") {
    val plan = RelationalOps.asofPurchaseClick(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
