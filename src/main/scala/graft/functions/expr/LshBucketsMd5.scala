package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ENGINE-PORTABLE multi-table LSH bucket ids: same semantics as
  * [[LshBuckets]] (table t's bucket packs `planes` hyperplane sign bits
  * into a long), but plane (t, j)'s component i comes from an md5-derived
  * uniform so any SQL engine rebuilds the identical hyperplanes:
  *
  *   u(t, j, i) = ((md5int("p#t#j#i") % 2000000) - 1000000) / 1000000.0
  *
  * where md5int = first 4 bytes of the md5 hex digest, unsigned — exactly
  * DuckDB's `('0x' || substr(md5('p#'||t||'#'||j||'#'||i), 1, 8))::BIGINT`.
  * u ∈ [-1, 1); bucket bit j = (dot(vec, plane_tj) > 0), both engines
  * computing the dot in double over the float→double upcast vector.
  *
  * The xxhash-family [[LshBuckets]] stays the production path (no digest
  * calls at all); this expression exists so the FULL multi-table LSH ANN
  * pipeline — bucketing, candidate equi-join, cosine top-k — can be
  * hash-checked against a DuckDB oracle (gate entry s20), the d8/d11 md5
  * portability trick applied to hyperplanes. The plane matrix is digested
  * ONCE per executor and cached (it depends only on (t, j, i)); each row
  * stays a single fused multiply-add loop.
  */
case class LshBucketsMd5(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets_md5 expects (array<float|double>, literal int planes, literal int tables), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets_md5"

  @transient private lazy val planes: Int = second.eval(null).asInstanceOf[Int]
  @transient private lazy val tables: Int = third.eval(null).asInstanceOf[Int]
  private def vecIsDouble: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private final class Mat(val dim: Int, val a: Array[Double])
  @transient @volatile private var cached: Mat = _

  private def matrixFor(dim: Int): Mat = {
    val c = cached
    if (c != null && c.dim >= dim) return c
    val md = java.security.MessageDigest.getInstance("MD5")
    val a = new Array[Double](tables * planes * dim)
    var t = 0; var k = 0
    while (t < tables) {
      var j = 0
      while (j < planes) {
        var i = 0
        while (i < dim) {
          md.reset()
          md.update(s"p#$t#$j#$i".getBytes("UTF-8"))
          val d = md.digest()
          val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          a(k) = (v % 2000000L - 1000000L).toDouble / 1000000.0
          k += 1; i += 1
        }
        j += 1
      }
      t += 1
    }
    val m = new Mat(dim, a)
    cached = m
    m
  }

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(vAny: AnyRef): ArrayData = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = matrixFor(n)
    val stride = m.dim
    val vd = vecIsDouble
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var j = 0
      while (j < planes) {
        val base = (t * planes + j) * stride
        var dot = 0.0
        var i = 0
        while (i < n) {
          val xv = if (vd) v.getDouble(i) else v.getFloat(i).toDouble
          dot += xv * m.a(base + i)
          i += 1
        }
        if (dot > 0) acc |= 1L << j
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any, p: Any, t: Any): Any =
    compute(v.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val ref = ctx.addReferenceObj("lshBucketsMd5", this, classOf[LshBucketsMd5].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBucketsMd5 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshBucketsMd5 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LshBucketsMd5].getName, "lsh_buckets_md5")
}
