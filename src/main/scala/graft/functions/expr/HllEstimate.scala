package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Harmonic-mean HLL estimate over an m=64 register array (the output of
  * [[HllAgg]] at p=6) — the scalar half of approximate COUNT(DISTINCT),
  * packaged as an expression so the optimizer rewrite
  * ([[graft.plans.ApproxDistinctRewrite]]) can splice it above the
  * aggregate in one expression tree.
  *
  * Arithmetic is EXACTLY [[graft.functions.Sketch.estimate]]: Σ 2^-rho is
  * exact in doubles (binary fractions, 64 terms), alpha = 0.709
  * (Flajolet's m=64 constant), linear counting below 2.5·m with empty
  * registers, the result pre-rounded to 2 decimals so the only
  * transcendental (ln) is pinned — the estimate is order-independent and
  * engine-reproducible (gate entries d16/d21). CodegenFallback: this
  * runs once per GROUP on a 64-slot array, not per input row. */
case class HllEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hll_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate expects the hll_agg register array, got ${t.simpleString}")
  }

  override protected def nullSafeEval(regs: Any): Any = {
    val a = regs.asInstanceOf[ArrayData]
    val m = a.numElements()
    require(m == 64, s"hll_estimate: alpha constant is the m=64 value, got m=$m")
    var s = 0.0
    var v = 0
    var i = 0
    val longs = child.dataType == ArrayType(LongType, containsNull = false) ||
      child.dataType == ArrayType(LongType, containsNull = true)
    while (i < m) {
      val rho = if (longs) a.getLong(i).toInt else a.getInt(i)
      s += java.lang.Math.pow(2.0, -rho)
      if (rho == 0) v += 1
      i += 1
    }
    val raw = 0.709 * m * m / s
    val est = if (raw <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) else raw
    // same pinning as Sketch.estimate: BigDecimal HALF_UP at 2 decimals
    // (Spark's round), so ln noise can't flip the last digit differently
    // across engines
    new java.math.BigDecimal(est)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllEstimate {
  val info: ExpressionInfo = new ExpressionInfo(classOf[HllEstimate].getName, "hll_estimate")
}
