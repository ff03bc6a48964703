package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of an embedding, one fused pass:
  * `quantize127(vec)` → struct(scale: double, q: array<bigint>) where
  * scale = max |v_i| and q_i = round(127 · v_i / scale), ties away from
  * zero (matching SQL ROUND in Spark and DuckDB). A zero vector
  * quantizes to all-zero with scale 0.
  *
  * Why native: the declarative form needs the scalar max inside the
  * per-element lambda, and CollapseProject re-inlines it — an O(dim²)
  * array_max per row (the CollapseProject precomputed-array trap). Here max
  * and quantize are one loop pair per row inside codegen. At 100 TB,
  * int8 + one float per vector is the difference between shipping 4·dim
  * bytes and dim+8 — quantize at ingest, dequantize (q_i·scale/127) only
  * inside distance kernels.
  *
  * Oracle-portable by construction (gate entry `s23_embed_quant`): both
  * engines compute the same double divisions and away-from-zero rounding.
  */
case class Quantize127(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize127 expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "quantize127"

  private def vecIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(vAny: AnyRef): InternalRow = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    val vd = vecIsDouble
    var mx = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (vd) v.getDouble(i) else v.getFloat(i).toDouble)
      if (x > mx) mx = x
      i += 1
    }
    val q = new Array[Long](n)
    if (mx > 0.0) {
      i = 0
      while (i < n) {
        val x = (if (vd) v.getDouble(i) else v.getFloat(i).toDouble) * 127.0 / mx
        // ROUND-half-away-from-zero (SQL round in both engines); Java's
        // Math.round is half-UP (-2.5 → -2) and would diverge on negatives
        q(i) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
        i += 1
      }
    }
    InternalRow(mx, new GenericArrayData(q))
  }

  override protected def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("quantize127", this, classOf[Quantize127].getName)
      s"$ref.compute($v)"
    })

  override protected def withNewChildInternal(newChild: Expression): Quantize127 =
    copy(child = newChild)
}

object Quantize127 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Quantize127].getName, "quantize127")
}
