package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}
import graft.functions.expr.{HllAgg, HllEstimate}

/** Approximate-query-processing rewrite: under
  * `spark.graft.approxCountDistinct = xxhash | md5`, every exact
  * `COUNT(DISTINCT x)` in an aggregation becomes the HLL sketch estimate
  * — `hll_estimate(hll_agg(hash32(x)))`, rounded half-up and cast back
  * to the bigint the Count produced, so the rewrite is schema-invisible
  * to everything downstream.
  *
  * Why an optimizer rule and not a helper function: dashboards and ad-hoc
  * SQL keep their exact syntax; the SESSION decides the accuracy/cost
  * trade. At 100 TB an exact distinct on a high-cardinality column
  * shuffles every distinct value (Spark plans it as a two-phase Expand +
  * regroup); the sketch moves 64 bytes per group per task instead —
  * the BlinkDB-style trade, ~13% standard error at p=6.
  *
  * Families: `xxhash` (production — xxhash64 masked to 32 bits) and
  * `md5` (engine-portable — the Sampling.hashBucket family, which lets a
  * DuckDB oracle reproduce the rewritten plan's output bit-for-bit; gate
  * entry d21). The conf is read per-invocation, so toggling applies to
  * the next query planned on the session.
  *
  * Scope guards: only whole-expression `COUNT(DISTINCT c)` with a single
  * argument and no FILTER clause is rewritten; multi-arg or filtered
  * counts keep exact semantics.
  */
class ApproxDistinctRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def hash32(c: Expression, family: String): Expression = family match {
    case "xxhash" =>
      Pmod(new XxHash64(Seq(c)), Literal(4294967296L))
    case "md5" => // Sampling.hashBucket: first 8 md5 hex digits as a long
      Cast(Conv(Substring(Md5(Cast(Cast(c, StringType), BinaryType)),
        Literal(1), Literal(8)), Literal(16), Literal(10)), LongType)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val family = session.conf.get("spark.graft.approxCountDistinct", "off")
    if (family != "xxhash" && family != "md5") return plan
    plan.transform {
      case agg: Aggregate =>
        val rewritten = agg.aggregateExpressions.map(_.transform {
          case AggregateExpression(Count(Seq(c)), _, true, None, _) =>
            val sketch = AggregateExpression(
              HllAgg(hash32(c, family), p = 6), Complete, isDistinct = false)
            // half-up to the nearest count, back to Count's bigint
            Cast(Floor(Add(HllEstimate(sketch), Literal(0.5, DoubleType))),
              LongType)
        }.asInstanceOf[NamedExpression])
        agg.copy(aggregateExpressions = rewritten)
    }
  }
}
