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

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           rightTieBreak: Seq[String] = Seq.empty,
           joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType),
      s"asOf supports inner|left, got $joinType")
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

    // at equal ts: right (side 0) sorts before left, so "<= ts" is inclusive;
    // among tied right rows the max tie-break is scanned last and wins
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = if (joinType == "inner") matched.filter(col("__last").isNotNull) else matched
    out.select(col("__l.*") +: right.columns.map(c => col(s"__last.$c")): _*)
  }
}
