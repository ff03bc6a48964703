package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestSpark

/** The grouped-top-k optimizer rewrite: session-gated, schema-identical
  * to the window form, sort-free plan, and OFF by default. */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 60 groups × 500 rows; value strictly ordered within each group so the
  // expected top-k is exact; tie-free ordering via unique id
  private def df = spark.range(30000).select(
    (col("id") % 60).as("g"), col("id").as("tie"),
    ((col("id") * 7919) % 30011).as("v"))

  private def windowed(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("tie").desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def withRewrite[T](body: => T): T = {
    spark.conf.set("spark.graft.topkRewrite", "true")
    try body finally spark.conf.unset("spark.graft.topkRewrite")
  }

  private def sorted(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))

  test("off by default: the window plan stays") {
    val plan = windowed(3).queryExecution.executedPlan.toString
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"), plan)
  }

  test("rewrite on: sort-free aggregate plan, identical rows incl. rn") {
    val expected = sorted(windowed(3).collect())
    withRewrite {
      val q = windowed(3)
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("topk_rows"), s"aggregate must replace the window:\n$phys")
      assert(!phys.contains("WindowExec") && !phys.contains("Window ") &&
        !phys.contains("Sort "), s"rewritten plan must not sort:\n$phys")
      assert(phys.contains("ObjectHashAggregate"), phys)
      assert(q.schema == windowed(3).schema)
      assert(sorted(q.collect()) sameElements expected)
    }
  }

  test("rn = 1 (the LWW shape) and ascending order both rewrite correctly") {
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("tie").asc)
    def q = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("g", "v", "tie")
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    withRewrite {
      assert(q.queryExecution.executedPlan.toString.contains("topk_rows"))
      assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        sameElements expected)
    }
  }

  test("buffers survive partial/final split and serialization across exchanges") {
    // many input partitions → partial buffers from every task merge at the
    // final stage through serialize/deserialize
    val spread = df.repartition(32)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("tie").desc)
    val expected = sorted(df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).collect())
    withRewrite {
      val got = sorted(spread.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 7).collect())
      assert(got sameElements expected)
    }
  }

  test("guards: mixed directions, non-literal k, extra conjuncts stay windowed") {
    withRewrite {
      val mixed = Window.partitionBy("g").orderBy(col("v").desc, col("tie").asc)
      val q1 = df.withColumn("rn", row_number().over(mixed)).filter(col("rn") <= 3)
      assert(!q1.queryExecution.optimizedPlan.toString.contains("topk_rows"))
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("tie").desc)
      val q2 = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("v") > 100)
      assert(!q2.queryExecution.optimizedPlan.toString.contains("topk_rows"))
      // rank() is not row_number: positions are not dense — must not rewrite
      val q3 = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
      assert(!q3.queryExecution.optimizedPlan.toString.contains("topk_rows"))
    }
  }

  test("direct topk_rows aggregate: per-key latest row equals max_by") {
    graft.GraftFunctions.register(spark)
    val got = df.groupBy("g").agg(expr(
        "topk_rows(struct(v, tie), struct(v, tie), 1)").as("t"))
      .select(col("g"), element_at(col("t"), 1).getField("v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = df.groupBy("g").agg(max(col("v")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }
}
