package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register sketch over a precomputed 32-bit hash column —
  * the approximate-distinct-count building block a curation pipeline uses
  * for per-source cardinality dashboards (how many UNIQUE documents /
  * urls / shingles per domain) without a count-distinct shuffle of the
  * values themselves.
  *
  * Input is a LONG holding a uniform 32-bit hash (xxhash64 masked, or the
  * engine-portable md5 bucket from graft.operators.Sampling.hashBucket —
  * the latter lets a DuckDB/any-SQL oracle reproduce the registers
  * bit-for-bit). The top `p` bits pick one of m = 2^p registers; the
  * register keeps the max over rho(w) = 1 + leading-zeros of the
  * remaining (32-p)-bit suffix — Flajolet's HLL, the same sketch behind
  * Spark's own approx_count_distinct, exposed here with a STABLE,
  * portable register layout so sketches can be stored in the lake,
  * merged across days, and read by other engines.
  *
  * TypedImperativeAggregate with a byte[m] buffer: partial aggregation
  * applies, so a 100 TB GROUP BY source moves m bytes per group per task
  * — and register merge is elementwise max, so sketches are mergeable
  * across arbitrary re-partitionings and incremental runs (union = max).
  *
  * Output array<int> of m registers; estimate via
  * graft.functions.Dedup.hllEstimate (or any engine: the harmonic-mean
  * formula over the exploded registers — oracle entry d16).
  */
case class HllAgg(
    child: Expression,
    p: Int = 6,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll_agg precision p must be in [4,16], got $p")
  private val m = 1 << p
  private val suffixBits = 32 - p
  private val suffixMask = (1L << suffixBits) - 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_agg expects a 32-bit hash as bigint/int, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = (v match {
        case l: java.lang.Long    => l.longValue
        case i: java.lang.Integer => i.longValue
      }) & 0xFFFFFFFFL
      val bucket = (h >>> suffixBits).toInt
      val w = h & suffixMask
      // rho = suffixBits - floor(log2 w) for w>0; all-zero suffix saturates.
      val rho =
        if (w == 0L) suffixBits + 1
        else suffixBits - (63 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {
  val info: ExpressionInfo = new ExpressionInfo(classOf[HllAgg].getName, "hll_agg")

  /** Precision from the optional second literal of `hll_agg(h[, p])`. */
  def precisionOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
    else 6
}
