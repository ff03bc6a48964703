package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** HyperLogLog sketch aggregate (expr.HllAgg) — production xxhash64 family
  * accuracy plus the merge law the lake storage story depends on. The
  * engine-portable md5 family is pinned bit-for-bit by oracle entries
  * d15/d16. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Production 32-bit hash: xxhash64 masked to its low 32 bits. */
  private def xx32(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(4294967296L))

  test("hll estimate tracks exact distinct within HLL error (xxhash64, m=64)") {
    graft.GraftFunctions.register(spark)
    // 5000 distinct values in one group, plus heavy duplication
    val df = spark.range(15000).select((col("id") % 5000).as("v"), lit("g").as("g"))
    val est = Sketch.estimate(
      Sketch.registers(spark, df, "g", xx32(col("v"))), "g")
      .select("est_distinct").as[Double].head()
    // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma
    assert(math.abs(est - 5000) / 5000 < 0.4, s"estimate $est vs exact 5000")
  }

  test("register sketch of a union is the elementwise max of the parts") {
    graft.GraftFunctions.register(spark)
    val all = spark.range(4000).select(col("id").as("v"), lit("g").as("g"))
    val lo = all.filter(col("v") < 1500)  // overlapping split
    val hi = all.filter(col("v") >= 1000)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.registers(spark, df, "g", xx32(col("v")))
    val merged = regs(lo).union(regs(hi))
      .groupBy("slot").agg(max("rho").as("rho"))
    val direct = regs(all).select("slot", "rho")
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty,
      "sketch(A ∪ B) must equal slotwise-max(sketch A, sketch B)")
  }

  test("cms estimate upper-bounds exact counts and is tight for hot items") {
    graft.GraftFunctions.register(spark)
    // zipf-ish: item i appears 1000/i times, i in 1..200
    val df = spark.range(200).select((col("id") + 1).as("i"))
      .select(col("i"),
        explode(sequence(lit(1L), (lit(1000L) / col("i")).cast("long"))).as("rep"))
      .select(lit("g").as("g"), concat(lit("item"), col("i")).as("v"))
    val regs = Sketch.cmsRegisters(spark, df, "g", col("v"))
    val cand = df.groupBy("g", "v").agg(count(lit(1)).as("n"))
    val got = Sketch.cmsEstimate(regs, cand, "g", "v")
      .join(cand, Seq("g", "v"))
      .select("v", "est", "n").as[(String, Long, Long)].collect()
    assert(got.forall { case (_, est, n) => est >= n },
      "CMS error is one-sided: est must never undercount")
    val (_, estHot, nHot) = got.find(_._1 == "item1").get
    // depth 4 / width 128 over ~1.2k distinct-weighted events: the hot
    // item's estimate should be within a few collisions of exact
    assert(estHot - nHot < 100, s"hot item est $estHot vs exact $nHot")
  }

  test("cms sketch of a union is the elementwise sum of the parts") {
    graft.GraftFunctions.register(spark)
    val all = spark.range(3000)
      .select(lit("g").as("g"), concat(lit("v"), col("id") % 700).as("v"))
    val lo = all.limit(1200)
    val hi = all.exceptAll(lo)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsRegisters(spark, df, "g", col("v"))
    val merged = regs(lo).union(regs(hi))
      .groupBy("slot").agg(sum("cnt").as("cnt"))
    val direct = regs(all).select("slot", "cnt")
    assert(direct.exceptAll(merged).isEmpty && merged.exceptAll(direct).isEmpty,
      "sketch(A ⊎ B) must equal slotwise-sum(sketch A, sketch B)")
  }

  test("cms registers match a scalar recomputation of the md5 bucketing") {
    graft.GraftFunctions.register(spark)
    val vals = Seq("alpha", "beta", "gamma", "alpha", "alpha", "beta")
    val df = vals.toDF("v").select(lit("g").as("g"), col("v"))
    val got = Sketch.cmsRegisters(spark, df, "g", col("v"))
      .filter(col("cnt") > 0).select("slot", "cnt").as[(Long, Long)]
      .collect().toMap
    val want = vals.flatMap { v =>
      val hex = java.security.MessageDigest.getInstance("MD5").digest(
        v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 4).map { j =>
        j * 128L + java.lang.Long.parseLong(hex.substring(7 * j, 7 * j + 7), 16) % 128
      }
    }.groupBy(identity).map { case (slot, hits) => slot -> hits.size.toLong }
    assert(got == want, s"got $got want $want")
  }

  test("registers match a scalar recomputation of bucket/rho") {
    graft.GraftFunctions.register(spark)
    val vals = Seq(0L, 1L, 42L, 4294967295L, 67108864L, 2147483648L)
    val df = vals.toDF("h").select(lit("g").as("g"), col("h"))
    val got = Sketch.registers(spark, df, "g", col("h"))
      .filter(col("rho") > 0).select("slot", "rho").as[(Long, Long)]
      .collect().toMap
    val want = vals.map { h =>
      val bucket = (h >>> 26).toInt
      val w = h & ((1L << 26) - 1)
      val rho = if (w == 0L) 27 else 26 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      bucket -> rho
    }.groupBy(_._1).map { case (b, rs) => b.toLong -> rs.map(_._2).max.toLong }
    assert(got == want, s"got $got want $want")
  }

  test("hist registers match a scalar recomputation; overflow slots catch tails") {
    val vals = Seq(-5.0, 0.0, 0.5, 9.99, 10.0, 25.0, 99.9, 100.0, 250.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val got = Sketch.histRegisters(spark, df, "g", col("v"), lo = 0.0, hi = 100.0, bins = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val want = (0L to 11L).map(_ -> 0L).toMap ++
      vals.groupBy { v =>
        if (v < 0.0) 0L
        else if (v >= 100.0) 11L
        else math.floor(v * 10 / 100.0).toLong + 1
      }.map { case (s, vs) => s -> vs.size.toLong }
    assert(got == want, s"got $got want $want")
    assert(got(0L) == 1 && got(11L) == 2, "below-lo and at-or-above-hi land in overflow slots")
  }

  test("hist sketch of a union is the elementwise sum of the parts") {
    graft.GraftFunctions.register(spark)
    val a = (1 to 400).map(i => ("g", (i % 97).toDouble)).toDF("g", "v")
    val b = (1 to 300).map(i => ("g", (i % 53).toDouble)).toDF("g", "v")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.histRegisters(spark, df, "g", col("v"), 0.0, 100.0, 20)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val (ra, rb, ru) = (regs(a), regs(b), regs(a.unionAll(b)))
    assert(ru == ra.map { case (s, c) => s -> (c + rb(s)) },
      "merged sketch must be the slotwise sum — the lake roll-up law")
  }

  test("hist quantiles interpolate within bins and track exact percentiles") {
    // uniform 1..1000 in [0, 1000) x 50 bins: every quantile is interior
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val regs = Sketch.histRegisters(spark, df, "g", col("v"), 0.0, 1000.0, 50)
    val got = Sketch.histQuantiles(regs, "g", Seq(0.25, 0.5, 0.9), 0.0, 1000.0, 50)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(got.size == 3)
    // bin width 20: interpolated estimate within one bin of the exact value
    assert(math.abs(got(0.25) - 250.0) <= 20.0, s"p25 ${got(0.25)}")
    assert(math.abs(got(0.5) - 500.0) <= 20.0, s"p50 ${got(0.5)}")
    assert(math.abs(got(0.9) - 900.0) <= 20.0, s"p90 ${got(0.9)}")
  }
}
