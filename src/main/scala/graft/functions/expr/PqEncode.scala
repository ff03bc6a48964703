package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode over the int8-quantized domain:
  * `pq_encode(q, codebook, m)` splits the quantized vector `q` (length
  * `dim`, from [[Quantize127]]) into `m` contiguous subvectors and, for
  * each, returns the INDEX of the codebook entry minimizing integer
  * squared L2 distance (ties → lowest index). `codebook` is a flat
  * `array<bigint>` of K full-length quantized vectors laid out
  * `[k*dim + j]`; each subspace uses its own slice of every entry.
  *
  * Why the quantized domain: symmetric int8 quantization is an L∞
  * normalization (×127), so codebook assignment clusters DIRECTIONS —
  * the right geometry for the cosine-style searches this library runs —
  * and every distance is an exact integer both engines reproduce
  * bit-for-bit, which makes even the approximate ADC search
  * oracle-checkable (gate entries `s32`/`s33`), unlike float-trained
  * PQ where argmin ties drift across engines.
  *
  * Why native: the argmin is K×dim multiply-adds per row (4k+ for the
  * defaults) — the per-row hot loop that belongs in one codegen'd kernel,
  * not an interpreted higher-order-function chain. At 100 TB this runs
  * once at ingest and the corpus ships as m bytes + one scale per vector
  * (64 float dims → 4 code bytes: a 64× compression before ADC search).
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType)
        if second.foldable && third.foldable => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<bigint>, literal array<bigint> codebook, " +
          s"literal int m), got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(qAny: AnyRef, cbAny: AnyRef, m: Int): ArrayData = {
    val q = qAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val dim = q.numElements()
    require(m > 0 && dim % m == 0,
      s"pq_encode: dim $dim not divisible into $m subspaces")
    require(cb.numElements() > 0 && cb.numElements() % dim == 0,
      s"pq_encode: codebook length ${cb.numElements()} not a multiple of dim $dim")
    val k = cb.numElements() / dim
    val subDim = dim / m
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      val off = mi * subDim
      var best = Long.MaxValue
      var bestIdx = 0
      var kk = 0
      while (kk < k) {
        val cOff = kk * dim + off
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = q.getLong(off + j) - cb.getLong(cOff + j)
          d += diff * diff
          j += 1
        }
        if (d < best) { best = d; bestIdx = kk } // strict < : lowest index wins ties
        kk += 1
      }
      out(mi) = bestIdx.toLong
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(q: Any, cb: Any, m: Any): Any =
    compute(q.asInstanceOf[AnyRef], cb.asInstanceOf[AnyRef], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cb, m) => {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $ref.compute($q, $cb, $m);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncode {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqEncode].getName, "pq_encode")
}
