package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binned interval join == naive quadratic join, incl. bin-boundary pairs") {
    val l = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L), (5L, -50L))
      .toDF("l_id", "l_ts")
    val r = Seq((10L, 1L), (11L, 100L), (12L, 199L), (13L, 301L), (14L, -149L))
      .toDF("r_id", "r_ts")
    val got = RangeJoin.intervalJoin(l, r, "l_ts", "r_ts", width = 100L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.join(r, abs(col("l_ts") - col("r_ts")) <= 100)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == want)
    // sanity: the boundary pair (ts 0, ts 100) is included, distance 101 is not
    assert(got.contains((1L, 11L)) && !got.contains((2L, 13L)))
  }

  test("no duplicate pairs from the 3-bin explode") {
    val l = spark.range(200).select(($"id" * 7).as("l_ts"), $"id".as("l_id"))
    val r = spark.range(200).select(($"id" * 11).as("r_ts"), $"id".as("r_id"))
    val joined = RangeJoin.intervalJoin(l, r, "l_ts", "r_ts", width = 50L)
    assert(joined.count() == joined.distinct().count())
  }

  test("plans an equi shuffle join on the bin — no nested-loop/cartesian") {
    val p = RelationalOps.rangeJoinErrClicks(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
