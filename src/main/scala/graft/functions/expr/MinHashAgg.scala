package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash set-union aggregate: folds per-row MinHash signatures
  * (array<long>, as produced by graft.functions.Dedup.minhashSignature)
  * into the signature of the UNION of the underlying shingle sets — the
  * defining MinHash property: sig(A ∪ B) = elementwise-min(sig(A), sig(B)).
  *
  * With it, corpus-level similarity becomes a GROUP BY:
  * {{{
  *   SELECT source, minhash_agg(sig) FROM docs GROUP BY source
  *   -- then estJaccard(sig_a, sig_b) ≈ jaccard(source_a, source_b)
  * }}}
  *
  * TypedImperativeAggregate with a primitive long[] buffer: partial
  * aggregation (map-side combine) applies, so a 100 TB GROUP BY moves one
  * 64-long signature per group per task — not the documents.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_agg expects array<bigint> signatures, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numHashes, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashAgg].getName, "minhash_agg")

  /** Signature width from the optional second literal argument of
    * `minhash_agg(sig[, width])`; defaults to the 64-wide xxhash family. */
  def widthOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
    else 64
}
