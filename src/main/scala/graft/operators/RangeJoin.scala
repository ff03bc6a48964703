package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: all pairs with `|leftTs - rightTs| <= width`,
  * WITHOUT an equi-key. Spark's only native plan for this is
  * BroadcastNestedLoopJoin / cartesian + filter — O(|L|·|R|), dead at
  * scale.
  *
  * Binned formulation: hash both sides into `width`-sized time bins; a
  * right row additionally lands in both neighbor bins. Any qualifying pair
  * is at most one bin apart, so it shares exactly one of the three copies
  * — the join becomes a plain equi-join on the bin id (one hash shuffle,
  * candidates only within a bin neighborhood), followed by the exact
  * |dt| <= width filter. No duplicates by construction: the left row's bin
  * is a single value and the right row's three bins are distinct, so each
  * pair meets exactly once.
  *
  * Cost: |L| + 3|R| shuffled rows, candidate volume = bin co-occupancy —
  * linear for event streams whose density per `width` window is bounded.
  * Skewed hot windows salt like any keyed join.
  *
  * Requirements: disjoint column names; both ts columns LONG (e.g. epoch
  * millis) — the bin arithmetic is integer.
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftTs: String, rightTs: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"left/right column names must be disjoint, both have: $overlap")
    // floorDiv semantics for negative-safe binning
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / width.toDouble).cast("long")
    val l = left.withColumn("__bin", bin(col(leftTs)))
    val r = right.withColumn("__bin",
      explode(array(bin(col(rightTs)) - 1, bin(col(rightTs)), bin(col(rightTs)) + 1)))
    l.join(r, Seq("__bin"))
      .filter(abs(col(leftTs) - col(rightTs)) <= width)
      .drop("__bin")
  }
}
