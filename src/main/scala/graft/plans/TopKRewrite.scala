package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.expr.TopKRowsAgg

/** Grouped-top-k rewrite: under `spark.graft.topkRewrite = true`, a
  * `Filter(row_number() <= k)` directly over its Window becomes a bounded
  * [[TopKRowsAgg]] aggregation + posexplode — schema-identical (the
  * row-number column is reconstructed from the explode position, under
  * the original exprIds), but planned as one ObjectHashAggregate instead
  * of shuffle + full per-partition sort + WindowExec.
  *
  * Why: WindowExec must SORT every row of every partition even though
  * only k per key survive the filter. Spark 3.5+ infers a
  * WindowGroupLimit (SPARK-37099) that caps each group at k rows early,
  * but both its partial and final stages sort their inputs and the
  * exchange still carries up to k individual rows per key per map task.
  * The aggregate form sorts NOTHING (size-k buffer per key, O(n log k)
  * comparisons) and moves one k-bounded buffer per key per task through
  * the exchange — at 100 TB "latest k per user" that converts a
  * corpus-wide sort into a streaming scan. The trade: aggregation state
  * is k rows per in-flight key, so k is capped (TopKRowsAgg.MaxK).
  *
  * Scope guards (anything else keeps the window plan): single
  * row_number window expression; the filter is exactly `rn <= k`,
  * `rn < k`, or `rn = 1` on that column; all sort directions equal with
  * default null ordering; deterministic partition/order expressions.
  * An already-inferred WindowGroupLimit child is stripped — its limit
  * semantics are subsumed (keeping it would re-introduce the sort it
  * requires below the aggregate).
  */
class TopKRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get("spark.graft.topkRewrite", "false") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond,
          w @ Window(Seq(al @ Alias(we: WindowExpression, _)), part, order, wChild, _))
          if we.windowFunction.isInstanceOf[RowNumber] && order.nonEmpty =>
        val rn = al.toAttribute
        val kOpt = cond match {
          case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
            if a.exprId == rn.exprId => Some(k)
          case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
            if a.exprId == rn.exprId => Some(k - 1)
          case EqualTo(a: AttributeReference, Literal(1, IntegerType))
            if a.exprId == rn.exprId => Some(1)
          case _ => None
        }
        val sameDir = order.map(_.direction).distinct.size == 1
        val defaultNulls = order.forall(o => o.nullOrdering ==
          (if (o.direction == Descending) NullsLast else NullsFirst))
        val det = order.forall(_.child.deterministic) && part.forall(_.deterministic)
        // an inferred WindowGroupLimit below the window is subsumed
        val child = wChild match {
          case WindowGroupLimit(p, o, _: RowNumber, _, gc)
            if p == part && o == order => gc
          case c => c
        }
        kOpt match {
          case Some(k) if k >= 1 && k <= TopKRowsAgg.MaxK &&
              sameDir && defaultNulls && det =>
            rewrite(child, part, order, k, rn)
          case _ => f
        }
    }
  }

  private def rewrite(child: LogicalPlan, part: Seq[Expression],
                      order: Seq[SortOrder], k: Int,
                      rn: Attribute): LogicalPlan = {
    val payStruct = CreateStruct(child.output)
    val ordStruct = CreateStruct(order.map(_.child))
    val agg = TopKRowsAgg(payStruct, ordStruct, k,
      ascending = order.head.direction == Ascending)
    val aggAlias = Alias(
      AggregateExpression(agg, Complete, isDistinct = false), "__topk")()
    val aggregate = Aggregate(part, Seq(aggAlias), child)
    val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__row", payStruct.dataType, nullable = false)()
    val gen = Generate(PosExplode(aggAlias.toAttribute), Nil, outer = false,
      None, Seq(posAttr, rowAttr), aggregate)
    // rebuild the window's output schema under its ORIGINAL exprIds: the
    // child columns from the payload struct, the row number from the
    // explode position (the array is emitted best-first)
    val cols = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
    }
    val rnCol = Alias(Add(posAttr, Literal(1)), rn.name)(exprId = rn.exprId)
    Project(cols :+ rnCol, gen)
  }
}
