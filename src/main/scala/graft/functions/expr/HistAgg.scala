package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-bin histogram sketch over a bounded numeric domain — the
  * mergeable quantile/distribution summary for corpus dashboards
  * ("what does the quality-score / doc-length / latency distribution
  * look like per source, per day, across 100 TB"): `bins + 2` long
  * counters per group (index 0 = below `lo`, `bins + 1` = at-or-above
  * `hi`, interior bin b covers [lo + (b−1)·w, lo + b·w)), mergeable by
  * elementwise addition — so per-epoch sketches stored in the lake
  * roll up across runs, the same contract as [[CmsAgg]].
  *
  * The bin index is the explicit expression
  * `floor((v − lo) · bins / (hi − lo)) + 1` — ONE double multiply and
  * divide in that exact order, so any engine (and the DuckDB oracle)
  * reproduces the registers bit-for-bit; we deliberately do NOT defer
  * to a builtin `width_bucket`, whose internal rounding is
  * implementation-defined. Counters are sums → order- and
  * partitioning-invariant, safe under task-retry nondeterminism.
  *
  * TypedImperativeAggregate with a long[bins+2] buffer: partial
  * aggregation applies, a 100 TB GROUP BY moves bins+2 longs per group
  * per task. Quantile estimation (cumulative scan + linear
  * interpolation) runs over the exploded registers — a (groups × bins)
  * relation, never corpus-sized ([[graft.functions.Sketch.histQuantiles]]).
  */
case class HistAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    bins: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bins >= 1 && bins <= (1 << 20), s"hist_agg bins out of range: $bins")
  require(lo < hi, s"hist_agg needs lo < hi, got [$lo, $hi)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hist_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hist_agg expects a DOUBLE value, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      val idx =
        if (d < lo) 0
        else if (d >= hi) bins + 1
        else math.floor((d - lo) * bins / (hi - lo)).toInt + 1
      buf(idx) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bins + 2)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistAgg =
    copy(child = newChildren.head)
}

object HistAgg {
  val info: ExpressionInfo = new ExpressionInfo(classOf[HistAgg].getName, "hist_agg")

  /** lo/hi/bins from the literals of `hist_agg(v, lo, hi[, bins])`. */
  def loOf(exprs: Seq[Expression]): Double =
    exprs(1).eval(null).asInstanceOf[Number].doubleValue
  def hiOf(exprs: Seq[Expression]): Double =
    exprs(2).eval(null).asInstanceOf[Number].doubleValue
  def binsOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 3) exprs(3).eval(null).asInstanceOf[Number].intValue else 64
}
