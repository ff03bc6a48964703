package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `nProbe` nearest IVF centroid ids for a vector, by cosine
  * similarity (descending, ties broken by ascending cell id), in ONE
  * projection.
  *
  * `nearest_cells(vec, cell_ids, centroids, nProbe)` where `cell_ids` is a
  * literal `array<bigint>` and `centroids` a literal parallel
  * `array<array<double>>` (collected on the driver — bounded at
  * nCells×dim doubles, e.g. 64×64).
  *
  * Why this exists: the IVF assign step used to be
  * `join(broadcast(centroids), lit(true))` — a BroadcastNestedLoopJoin
  * exploding the corpus ×nCells — followed by a `row_number()` window
  * re-shuffling the blown-up rows on vec_id, per Lloyd iteration. That is
  * N×nCells rows of traffic to compute a per-row argmax. This expression
  * is the argmax: zero shuffle, zero row blow-up, whole-stage codegen.
  *
  * Cosine math and tie order replicate the previous plan exactly: the
  * per-cell score is [[CosineSimilarity]]'s double loop, and the
  * selection order matches `ORDER BY cos DESC, cell_id ASC` under Spark's
  * double ordering (NaN greatest), so assignments are unchanged.
  */
case class NearestCells(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(LongType, _),
            ArrayType(ArrayType(DoubleType, _), _), IntegerType)
          if second.foldable && third.foldable && fourth.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells expects (array<float|double>, literal array<bigint> ids, " +
          s"literal array<array<double>> centroids, literal int nProbe), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString}, ${d.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  @transient private lazy val cellIds: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val nProbe: Int = fourth.eval(null).asInstanceOf[Int]

  private def vecIsDouble: Boolean = first.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** cos(vec, cent) — same loop, order, and NaN behavior as
    * [[CosineSimilarity]] (pinned against it in SimilaritySpec). */
  private def cos(v: ArrayData, cent: Array[Double], vd: Boolean): Double = {
    val n = math.min(v.numElements(), cent.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (vd) v.getDouble(i) else v.getFloat(i).toDouble
      val yv = cent(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** (c1,i1) strictly before (c2,i2) under ORDER BY cos DESC, id ASC.
    * java.lang.Double.compare is Spark's double ordering (NaN greatest). */
  private def beats(c1: Double, i1: Long, c2: Double, i2: Long): Boolean = {
    val cmp = java.lang.Double.compare(c1, c2)
    cmp > 0 || (cmp == 0 && i1 < i2)
  }

  /** Row kernel, shared by interpreted eval and codegen: top-m insertion
    * over the (small) centroid list. */
  def compute(vAny: AnyRef): ArrayData = {
    val v = vAny.asInstanceOf[ArrayData]
    val vd = vecIsDouble
    val nCells = cents.length
    val m = math.min(nProbe, nCells)
    val topC = new Array[Double](m)
    val topI = new Array[Long](m)
    var filled = 0
    var k = 0
    while (k < nCells) {
      val c = cos(v, cents(k), vd)
      val id = cellIds(k)
      var pos = filled
      while (pos > 0 && beats(c, id, topC(pos - 1), topI(pos - 1))) pos -= 1
      if (pos < m) {
        var q = math.min(filled, m - 1)
        while (q > pos) { topC(q) = topC(q - 1); topI(q) = topI(q - 1); q -= 1 }
        topC(pos) = c; topI(pos) = id
        if (filled < m) filled += 1
      }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topI, filled))
  }

  override protected def nullSafeEval(v: Any, ids: Any, cs: Any, p: Any): Any =
    compute(v.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => {
      val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
      s"${ev.value} = $ref.compute($v);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): NearestCells =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object NearestCells {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NearestCells].getName, "nearest_cells")
}
