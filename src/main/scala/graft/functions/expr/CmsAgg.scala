package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min frequency sketch over md5-hashed items — the fixed-size
  * answer to "how often does each token/url/shingle occur in 100 TB"
  * when the exact groupBy would be vocabulary-explosive: d×w counters
  * per group, point estimates that only ever OVER-count (min over d
  * independent rows bounds the collision error), mergeable by addition.
  *
  * Input is the item's md5 hex string (Spark's `md5()`); row j of the
  * sketch buckets the item by hex digits [7j, 7j+7) — four independent
  * 28-bit hashes from one md5, the same split any SQL engine can
  * reproduce with substr, which is what makes the sketch itself (not
  * just derived answers) oracle-checkable bit-for-bit (entries d17/d18).
  * Counters are SUMS, so unlike Misra-Gries-style summaries the sketch
  * is invariant to row order and partitioning — the property that makes
  * it safe under Spark's nondeterministic task scheduling.
  *
  * TypedImperativeAggregate with a long[d*w] buffer: partial aggregation
  * applies, a 100 TB GROUP BY moves d·w longs per group per task.
  */
case class CmsAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 128,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 4, s"cms_agg depth must be in [1,4] (md5 has 4x7 hex), got $depth")
  require(width >= 2 && width <= (1 << 20), s"cms_agg width out of range: $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_agg expects the md5 hex string of the item, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // md5() emits lowercase ASCII hex — parse the UTF8String bytes in
      // place (no String / substring allocations in the per-row loop)
      val u = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      var j = 0
      while (j < depth) {
        var k = 7 * j
        val end = k + 7
        var acc = 0L
        while (k < end) {
          acc = (acc << 4) | Character.digit(u.getByte(k).toChar, 16).toLong
          k += 1
        }
        buf(j * width + (acc % width).toInt) += 1
        j += 1
      }
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
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
}

object CmsAgg {
  val info: ExpressionInfo = new ExpressionInfo(classOf[CmsAgg].getName, "cms_agg")

  /** depth/width from optional literals of `cms_agg(h[, depth, width])`. */
  def depthOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue else 4
  def widthOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 2) exprs(2).eval(null).asInstanceOf[Number].intValue else 128
}
