package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a BOUNDED AGGREGATE instead of a sort + window: keep
  * the k best (payload, ordering) pairs per group in a size-k buffer,
  * return them as an array sorted best-first.
  *
  * This is the engine-level answer to the `row_number() OVER (...) <= k`
  * pattern. Spark plans that as a full shuffle plus a per-partition SORT
  * of EVERY row (WindowExec requires sorted input; since 3.5 an inferred
  * WindowGroupLimit pre-filters each group to k rows, but both its
  * partial and final stages still sort, and the shuffle still carries up
  * to k rows per key per map task as individual rows). As an aggregate
  * the same query is one ObjectHashAggregate: the partial stage scans
  * unsorted input once keeping a k-element buffer per key — O(n log k)
  * comparisons, no sort anywhere — and the exchange moves ONE buffer row
  * per key per task. At 100 TB "latest k per user" this is the difference
  * between sorting the corpus and streaming it.
  *
  * `ascending = false` (the LWW/top-seller shape) keeps the k LARGEST by
  * the natural ascending order of the `ordering` struct, best = largest
  * first in the output; `ascending = true` keeps the k smallest, best =
  * smallest first. Mixed per-column directions are the caller's job to
  * encode in the struct (or stay on the window form). Ties at the k-th
  * place keep the earlier-seen row — the same arbitrary-among-ties
  * contract as `row_number`; pass a total ordering for determinism.
  */
case class TopKRowsAgg(
    payload: Expression,
    ordering: Expression,
    k: Int,
    ascending: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsAgg.Buffer] {

  require(k >= 1 && k <= TopKRowsAgg.MaxK,
    s"topk_rows k must be in [1, ${TopKRowsAgg.MaxK}], got $k")

  override def children: Seq[Expression] = Seq(payload, ordering)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_rows"

  private def payType: StructType = payload.dataType.asInstanceOf[StructType]
  private def ordType: StructType = ordering.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(payType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, ordering.dataType) match {
      case (_: StructType, o: StructType)
          if o.forall(f => RowOrdering.isOrderable(f.dataType)) =>
        TypeCheckResult.TypeCheckSuccess
      case (p, o) => TypeCheckResult.TypeCheckFailure(
        s"topk_rows expects (payload struct, orderable ordering struct), " +
          s"got (${p.simpleString}, ${o.simpleString})")
    }

  // natural ASC comparator over the ordering struct; for the keep-largest
  // form the buffer evicts its minimum, so "best" is always the maximum
  // under cmp — flipping the sign flips the semantics wholesale
  @transient private lazy val natural =
    RowOrdering.createNaturalAscendingOrdering(ordType.map(_.dataType))
  private def cmp(a: InternalRow, b: InternalRow): Int = {
    val c = natural.compare(a, b)
    if (ascending) -c else c
  }

  override def createAggregationBuffer(): TopKRowsAgg.Buffer =
    new TopKRowsAgg.Buffer(k)

  override def update(buf: TopKRowsAgg.Buffer, input: InternalRow): TopKRowsAgg.Buffer = {
    val o = ordering.eval(input).asInstanceOf[InternalRow]
    // full buffer + not better than the current worst → reject without
    // copying anything (the hot path once a group saturates)
    if (buf.size == k && cmp(o, buf.ord(buf.worst)) <= 0) return buf
    val p = payload.eval(input).asInstanceOf[InternalRow]
    insert(buf, o.copy(), p.copy())
    buf
  }

  override def merge(a: TopKRowsAgg.Buffer, b: TopKRowsAgg.Buffer): TopKRowsAgg.Buffer = {
    var i = 0
    while (i < b.size) {
      if (a.size < k || cmp(b.ord(i), a.ord(a.worst)) > 0)
        insert(a, b.ord(i), b.pay(i))
      i += 1
    }
    a
  }

  /** Buffer kept sorted ASC under cmp: index 0 = worst, size-1 = best. */
  private def insert(buf: TopKRowsAgg.Buffer, o: InternalRow, p: InternalRow): Unit = {
    var lo = 0; var hi = buf.size
    while (lo < hi) { // first index with cmp(buf.ord(idx), o) > 0
      val mid = (lo + hi) >>> 1
      if (cmp(buf.ord(mid), o) > 0) hi = mid else lo = mid + 1
    }
    buf.insertAt(lo, o, p)
    if (buf.size > k) buf.dropWorst()
  }

  override def eval(buf: TopKRowsAgg.Buffer): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) { out(i) = buf.pay(buf.size - 1 - i); i += 1 } // best first
    new GenericArrayData(out)
  }

  @transient private lazy val pairType =
    StructType(Seq(StructField("o", ordType), StructField("p", payType)))
  @transient private lazy val pairProj = UnsafeProjection.create(pairType)

  override def serialize(buf: TopKRowsAgg.Buffer): Array[Byte] = {
    val rows = new Array[Array[Byte]](buf.size)
    var total = 4
    var i = 0
    while (i < buf.size) {
      rows(i) = pairProj(InternalRow(buf.ord(i), buf.pay(i))).getBytes
      total += 4 + rows(i).length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsAgg.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKRowsAgg.Buffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      // serialized in buffer order (ASC under cmp) → append preserves it
      buf.insertAt(buf.size, row.getStruct(0, ordType.size).copy(),
        row.getStruct(1, payType.size).copy())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(payload = newChildren(0), ordering = newChildren(1))
}

object TopKRowsAgg {
  val MaxK = 1000

  val info: ExpressionInfo = new ExpressionInfo(classOf[TopKRowsAgg].getName, "topk_rows")

  /** k / ascending from the literal args of `topk_rows(pay, ord, k[, asc])`. */
  def kOf(exprs: Seq[Expression]): Int =
    exprs(2).eval(null).asInstanceOf[Number].intValue
  def ascOf(exprs: Seq[Expression]): Boolean =
    exprs.length > 3 && exprs(3).eval(null).asInstanceOf[Boolean]

  /** Sorted pair buffer (parallel arrays, ASC under the agg's comparator:
    * index 0 = worst kept, size-1 = best). Capacity k+1 so insert-then-drop
    * never reallocates. */
  final class Buffer(k: Int) {
    private val ords = new Array[InternalRow](k + 1)
    private val pays = new Array[InternalRow](k + 1)
    var size: Int = 0
    def worst: Int = 0
    def ord(i: Int): InternalRow = ords(i)
    def pay(i: Int): InternalRow = pays(i)
    def insertAt(i: Int, o: InternalRow, p: InternalRow): Unit = {
      System.arraycopy(ords, i, ords, i + 1, size - i)
      System.arraycopy(pays, i, pays, i + 1, size - i)
      ords(i) = o; pays(i) = p; size += 1
    }
    def dropWorst(): Unit = {
      System.arraycopy(ords, 1, ords, 0, size - 1)
      System.arraycopy(pays, 1, pays, 0, size - 1)
      size -= 1
    }
  }
}
