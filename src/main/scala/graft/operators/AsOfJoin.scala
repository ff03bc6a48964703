package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row of the
  * same key with `rightTs <= leftTs` (inclusive). The classic point-in-time
  * lookup (trade←quote, event←last-state) that Spark has no built-in
  * operator for.
  *
  * NOT implemented as an inequality join: `l JOIN r ON key AND r.ts <= l.ts`
  * explodes to every (left, earlier-right) pair before a window prunes it —
  * O(n·m) per key, unusable at scale. This is the merge-scan formulation:
  *
  *   1. tag both sides and UNION them (no join at all),
  *   2. one hash shuffle on the key, one per-key sort by (ts, side, tie),
  *   3. running `last(right-payload, ignoreNulls)` propagates the latest
  *      right row into each left row in a single pass.
  *
  * Cost is one shuffle + sort of |L| + |R| rows — the same shape Spark
  * plans for a sort-merge join, with none of the pair blow-up. Skewed keys
  * salt the same way any keyed operator does.
  *
  * Determinism: right rows tied on (key, ts) are ordered by `rightTieBreak`
  * ascending and the LAST one wins — i.e. the max tie-break, matching a
  * `row_number() OVER (ORDER BY ts DESC, tie DESC) = 1` oracle. Pass a
  * tie-break that is unique per (key, ts) for a fully deterministic result.
  *
  * Requirements: left/right column names disjoint; `leftTs`/`rightTs` the
  * same orderable type.
  */
object AsOfJoin {

  /** `direction`: "backward" (default) finds the most recent right row
    * with `rightTs <= leftTs`; "forward" (the pandas merge_asof
    * direction='forward' analog — "first quote AFTER the trade") finds
    * the EARLIEST right row with `rightTs >= leftTs`. Forward is the same
    * merge-scan with the per-key order reversed: the running last(right)
    * then carries the smallest not-earlier right timestamp, and among
    * tied right rows the MIN tie-break wins (mirroring backward's max —
    * both match a `row_number() = 1` oracle in their scan direction). */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           rightTieBreak: Seq[String] = Seq.empty,
           joinType: String = "inner",
           direction: String = "backward"): DataFrame = {
    require(Seq("inner", "left").contains(joinType),
      s"asOf supports inner|left, got $joinType")
    require(Seq("backward", "forward").contains(direction),
      s"asOf direction must be backward|forward, got $direction")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"left/right column names must be disjoint, both have: $overlap")

    val lPay = struct(left.columns.map(col).toIndexedSeq: _*)
    val rPay = struct(right.columns.map(col).toIndexedSeq: _*)
    val lPayType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rPayType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val tie =
      if (rightTieBreak.isEmpty) lit(0L)
      else struct(rightTieBreak.map(col).toIndexedSeq: _*)

    val rTagged = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      tie.as("__tie"),
      lit(null).cast(lPayType).as("__l"), rPay.as("__r"))
    val lTagged = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rTagged.schema("__tie").dataType).as("__tie"),
      lPay.as("__l"), lit(null).cast(rPayType).as("__r"))

    // at equal ts: right (side 0) sorts before left, so the bound is
    // inclusive in BOTH directions; among tied right rows the last-
    // scanned one wins (max tie-break backward, min forward)
    val ordering =
      if (direction == "backward")
        Seq(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_last)
      else
        Seq(col("__ts").desc, col("__side").asc, col("__tie").desc_nulls_last)
    val w = Window.partitionBy(col("__k"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = if (joinType == "inner") matched.filter(col("__last").isNotNull) else matched
    out.select(col("__l.*") +: right.columns.map(c => col(s"__last.$c")): _*)
  }
}
