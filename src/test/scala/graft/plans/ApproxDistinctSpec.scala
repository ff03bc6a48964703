package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The approx-count-distinct optimizer rewrite: session-gated, schema-
  * invisible, sketch-accurate, and OFF by default. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = spark.range(30000)
    .select((col("id") % 3).cast("string").as("g"), (col("id") % 5000).as("v"))

  private def query = df.groupBy("g").agg(count_distinct(col("v")).as("n"))

  private def withFamily[T](family: String)(body: => T): T = {
    spark.conf.set("spark.graft.approxCountDistinct", family)
    try body finally spark.conf.unset("spark.graft.approxCountDistinct")
  }

  test("off by default: exact counts, plan keeps the distinct aggregate") {
    val rows = query.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.values.forall(_ == 5000L), rows.toString)
  }

  test("xxhash family: plan carries hll_agg, result is sketch-accurate bigint") {
    withFamily("xxhash") {
      val plan = query.queryExecution.optimizedPlan.toString
      assert(plan.contains("hll_agg"), s"rewrite must splice the sketch:\n$plan")
      assert(!plan.toLowerCase.contains("count(distinct"), plan)
      val rows = query.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma around 5000
      assert(rows.values.forall(n => math.abs(n - 5000.0) / 5000.0 < 0.4),
        rows.toString)
    }
  }

  test("md5 family matches the declarative Sketch pipeline bit-for-bit") {
    withFamily("md5") {
      val got = query.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = graft.functions.Sketch.estimate(
        graft.functions.Sketch.registers(spark, df, "g",
          graft.operators.Sampling.hashBucket(col("v"))), "g")
        .collect()
        .map(r => r.getString(0) -> math.floor(r.getDouble(1) + 0.5).toLong).toMap
      assert(got == expected, s"got $got expected $expected")
    }
  }

  test("rewrite is schema-invisible: bigint column, downstream filter works") {
    withFamily("md5") {
      assert(query.schema("n").dataType ==
        org.apache.spark.sql.types.LongType)
      // downstream operators keep working on the rewritten column
      assert(query.filter(col("n") > 0).count() == 3L)
    }
  }

  test("guards: multi-arg and filtered distinct counts stay exact") {
    withFamily("md5") {
      val multi = df.groupBy("g")
        .agg(count_distinct(col("v"), col("g")).as("n"))
      assert(!multi.queryExecution.optimizedPlan.toString.contains("hll_agg"))
      val filtered = df.groupBy("g")
        .agg(count_distinct(col("v")).as("n"),
          count(lit(1)).as("total"))
      // the plain count(*) alongside is untouched
      assert(filtered.collect().map(_.getLong(2)).forall(_ == 10000L))
    }
  }
}
