package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cardinality sketching for corpus dashboards: per-group HyperLogLog
  * registers (the [[graft.functions.expr.HllAgg]] custom aggregate) and
  * the harmonic-mean estimate, both in the engine-portable register
  * layout so the sketch itself — not just the final number — round-trips
  * through the lake and through other engines (oracle entries d15/d16).
  *
  * Scale shape: `registers` is one partial-agg-friendly GROUP BY moving
  * 2^p bytes per group per task; `estimate` runs over the exploded
  * registers — a relation of (groups × m) rows, never corpus-sized.
  */
object Sketch {

  /** Per-group HLL registers, exploded to (group, slot, rho) rows — the
    * storable/portable sketch form (slot-max merges across runs). `hashCol`
    * must hold a uniform 32-bit hash; use `Sampling.hashBucket` for the
    * engine-portable md5 family or a masked xxhash64 in production. */
  def registers(spark: SparkSession, df: DataFrame, groupCol: String,
                hashCol: org.apache.spark.sql.Column, p: Int = 6): DataFrame = {
    graft.GraftFunctions.register(spark)
    df.select(col(groupCol), hashCol.as("__h"))
      .groupBy(groupCol).agg(call_function("hll_agg", col("__h"), lit(p)).as("regs"))
      .select(col(groupCol), posexplode(col("regs")))
      .select(col(groupCol), col("pos").cast("long").as("slot"),
        col("col").cast("long").as("rho"))
  }

  /** HLL estimate from exploded (group, slot, rho) registers. The
    * harmonic-mean sum Σ 2^-rho is EXACT in doubles (each term is a binary
    * fraction ≥ 2^-(33-p), at most 2^p terms), so the estimate is
    * order-independent and bit-identical across engines; the only
    * transcendental is ln in the small-range linear-counting branch,
    * pinned by round(…, 2). alpha for m=64 is Flajolet's 0.709. */
  def estimate(regs: DataFrame, groupCol: String, p: Int = 6): DataFrame = {
    require(p == 6, "alpha constant below is the m=64 value")
    val m = (1 << p).toDouble
    val raw = lit(0.709) * lit(m) * lit(m) / col("__s")
    regs.groupBy(groupCol)
      .agg(sum(pow(lit(2.0), -col("rho"))).as("__s"),
        sum(when(col("rho") === 0, 1L).otherwise(0L)).as("__v"))
      .select(col(groupCol),
        round(when(raw <= lit(2.5 * m) && col("__v") > 0,
          lit(m) * log(lit(m) / col("__v"))).otherwise(raw), 2)
          .as("est_distinct"))
  }

  /** Per-group count-min registers, exploded to (group, slot, cnt) — the
    * storable frequency sketch ([[graft.functions.expr.CmsAgg]]; slot =
    * row·width + bucket, rows bucket by md5 hex digits [7j, 7j+7)).
    * `itemCol` is the raw item; one row per OCCURRENCE. */
  def cmsRegisters(spark: SparkSession, df: DataFrame, groupCol: String,
                   itemCol: Column, depth: Int = 4, width: Int = 128): DataFrame = {
    graft.GraftFunctions.register(spark)
    df.select(col(groupCol), md5(itemCol).as("__m"))
      .groupBy(groupCol)
      .agg(call_function("cms_agg", col("__m"), lit(depth), lit(width)).as("c"))
      .select(col(groupCol), posexplode(col("c")))
      .select(col(groupCol), col("pos").cast("long").as("slot"),
        col("col").as("cnt"))
  }

  /** The slots a candidate item hashes to, as an array column — mirrors
    * CmsAgg's bucketing so point queries are joins against the exploded
    * registers. */
  def cmsSlots(itemCol: Column, depth: Int = 4, width: Int = 128): Column =
    array((0 until depth).map { j =>
      lit(j.toLong * width) +
        conv(substring(md5(itemCol), 7 * j + 1, 7), 16, 10).cast("long") % width
    }: _*)

  /** Per-group fixed-bin histogram registers, exploded to (group, slot,
    * cnt) — the storable distribution sketch ([[graft.functions.expr
    * .HistAgg]]; slot 0 = below `lo`, `bins+1` = at-or-above `hi`,
    * interior slot b covers [lo + (b−1)·w, lo + b·w)). Mergeable by
    * slotwise addition across runs/epochs, like [[cmsRegisters]]. */
  def histRegisters(spark: SparkSession, df: DataFrame, groupCol: String,
                    valueCol: Column, lo: Double, hi: Double,
                    bins: Int = 64): DataFrame = {
    graft.GraftFunctions.register(spark)
    df.select(col(groupCol), valueCol.cast("double").as("__v"))
      .groupBy(groupCol)
      .agg(call_function("hist_agg", col("__v"), lit(lo), lit(hi), lit(bins)).as("h"))
      .select(col(groupCol), posexplode(col("h")))
      .select(col(groupCol), col("pos").cast("long").as("slot"), col("col").as("cnt"))
  }

  /** Quantile estimates from exploded histogram registers: for each q,
    * the unique non-empty slot whose cumulative range covers rank = q·N,
    * linearly interpolated inside the bin (edge slots clamp to lo/hi).
    * Pure double arithmetic in a FIXED operation order, so any engine
    * replays it exactly; runs over the (groups × bins) register relation,
    * never the corpus. */
  def histQuantiles(regs: DataFrame, groupCol: String, qs: Seq[Double],
                    lo: Double, hi: Double, bins: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy("slot")
    val cum = regs
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__cumb", col("__cum") - col("cnt"))
      .withColumn("__tot", sum(col("cnt")).over(Window.partitionBy(groupCol)))
    qs.map { q =>
      val rank = lit(q) * col("__tot").cast("double")
      cum.filter(col("cnt") > 0 &&
          col("__cumb").cast("double") < rank && rank <= col("__cum").cast("double"))
        .select(col(groupCol), lit(q).as("q"),
          round(when(col("slot") === 0, lo)
            .when(col("slot") === bins + 1, hi)
            .otherwise(lit(lo) +
              ((col("slot") - 1).cast("double") +
                (rank - col("__cumb").cast("double")) / col("cnt").cast("double")) *
                lit((hi - lo) / bins)), 6).as("est"))
    }.reduce(_ unionByName _)
  }

  /** Count-min point estimates: for each candidate (group, item) row, the
    * min counter over its `depth` slots — an upper bound on the item's
    * true occurrence count in the group. One broadcast-sized explode
    * (depth rows per candidate) + one join against the registers +
    * a min: at 100 TB the registers relation is groups × (d·w), never
    * corpus-sized; candidates come from a vocab scan or a hash sample. */
  def cmsEstimate(regs: DataFrame, candidates: DataFrame, groupCol: String,
                  itemCol: String, depth: Int = 4, width: Int = 128): DataFrame =
    candidates
      .withColumn("slot", explode(cmsSlots(col(itemCol), depth, width)))
      .join(regs, Seq(groupCol, "slot"))
      .groupBy(col(groupCol), col(itemCol))
      .agg(min(col("cnt")).as("est"))
}
