package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `tables` LSH bucket ids of an embedding in one compiled pass.
  *
  * Semantics are bit-for-bit those of the declarative reference form
  * (graft.functions.Similarity.lshBucketsRef): table t's bucket packs
  * `planes` hyperplane sign bits into a long, where plane j's component i
  * is a deterministic pseudo-uniform value in [-1,1) derived from
  * `xxhash64(t, j, i)` (all int arguments, Spark's seed 42) — no driver
  * randomness, so corpus and queries bucket identically on any cluster.
  * This expression calls the same `XXH64.hashInt` chain Spark's xxhash64
  * uses, so the two paths agree exactly (pinned in SimilaritySpec).
  *
  * Why native: the reference form is an `aggregate`-of-`zip_with` fold —
  * interpreted CodegenFallback, O(tables·planes·dim) lambda evaluations
  * and 3 intermediate arrays per row. Here the plane matrix is computed
  * once per executor (it depends only on (t, j, i), not on data) and each
  * row is a single fused multiply-add loop inside WholeStageCodegen —
  * the shape you need when bucketing 10^9 vectors.
  */
case class LshBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets expects (array<float|double>, literal int planes, literal int tables), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val planes: Int = second.eval(null).asInstanceOf[Int]
  @transient private lazy val tables: Int = third.eval(null).asInstanceOf[Int]
  private def vecIsDouble: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Immutable plane-matrix snapshot (values for every (t, j, i<dim)),
    * grown on demand if a longer vector shows up; racing rebuilds are
    * benign (the values are deterministic). */
  private final class Mat(val dim: Int, val a: Array[Double])
  @transient @volatile private var cached: Mat = _

  private def matrixFor(dim: Int): Mat = {
    val c = cached
    if (c != null && c.dim >= dim) return c
    val a = new Array[Double](tables * planes * dim)
    var t = 0; var k = 0
    while (t < tables) {
      val ht = XXH64.hashInt(t, 42L)
      var j = 0
      while (j < planes) {
        val hj = XXH64.hashInt(j, ht)
        var i = 0
        while (i < dim) {
          val h = XXH64.hashInt(i, hj)
          val r = h % 2000001L
          val p = if (r < 0) r + 2000001L else r
          a(k) = p.toDouble / 1000000.0 - 1.0
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
      val ref = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshBuckets {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LshBuckets].getName, "lsh_buckets")
}
