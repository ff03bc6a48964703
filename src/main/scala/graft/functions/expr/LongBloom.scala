package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bloom filter over the 64-bit hash domain — the membership-sketch side
  * of sketch-guided exact operators (the [[KeyBloomAgg]] pattern lifted
  * from string record keys to the `shingle_hashes64` fingerprint domain).
  *
  * The motivating 100 TB shape is decontamination: the exact path
  * broadcasts the benchmark's distinct shingle set, which is right while
  * eval suites are small — but a consortium-scale held-out set (billions
  * of shingles) blows the broadcast budget. Its Bloom filter is FIXED
  * SIZE (bits/8 bytes; at the k=5 probes below, ~1% fpp needs ~10 bits
  * per key — so 10⁶ keys fit in ~1.2 MiB, 10⁹ keys need ~1.2 GiB: size
  * `bits` to ≥10× the expected distinct-key count, next power of two —
  * see Dedup.bloomDecontaminate's auto-sizing), and a probe has no false
  * negatives, so `bloom_any64` is a sound map-side prefilter: docs sharing ≥1 shingle always survive to the exact
  * re-check, and false positives only cost re-checked rows, never
  * correctness (`d20_heavy_hitters` made the same argument for CMS).
  *
  * `bloom_agg64(hashes[, bits])` accepts a LONG or ARRAY<LONG> child, so
  * the benchmark side aggregates straight over `shingle_hashes64` output
  * with no explode. Registers are bytewise-OR mergeable (partial agg,
  * cross-epoch unions, lake storage — same contract as the other
  * sketches).
  */
case class LongBloomAgg(
    child: Expression,
    bits: Int = 1 << 20,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(bits >= 64 && Integer.bitCount(bits) == 1,
    s"bloom_agg64 bits must be a power of two >= 64, got $bits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg64 expects LONG or ARRAY<LONG>, got ${t.simpleString}")
  }

  private val isArray = child.dataType.isInstanceOf[ArrayType]

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](bits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      if (isArray) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          if (!arr.isNullAt(i)) LongBloom.set(buf, arr.getLong(i), bits)
          i += 1
        }
      } else LongBloom.set(buf, v.asInstanceOf[Long], bits)
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): LongBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongBloomAgg =
    copy(child = newChildren.head)
}

object LongBloomAgg {
  val info: ExpressionInfo = new ExpressionInfo(classOf[LongBloomAgg].getName, "bloom_agg64")

  def bitsOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
    else 1 << 20
}

/** `bloom_any64(filter, hashes)` — true iff ANY element of the ARRAY<LONG>
  * might be in the filter. Codegen'd (one static call, no boxing): this is
  * the per-document hot path of the prefilter, running once per corpus row
  * inside the scan stage. */
case class BloomAny64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_any64 expects (BINARY, ARRAY<LONG>), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(filter: Any, hashes: Any): Any =
    LongBloom.anyContain(filter.asInstanceOf[Array[Byte]],
      hashes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, h) =>
      s"${ev.value} = graft.functions.expr.LongBloom.anyContain($f, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomAny64 =
    copy(left = newLeft, right = newRight)
}

object BloomAny64 {
  val info: ExpressionInfo = new ExpressionInfo(classOf[BloomAny64].getName, "bloom_any64")
}

/** Shared position function ([[KeyBloom]]'s Kirsch–Mitzenmacher layout in
  * the long domain: h1/h2 = xxhash64 of the value at seeds 0/1, h2 forced
  * odd, k = 5 probes). One code path for build and probe. */
object LongBloom {
  val K = 5

  private[expr] def set(buf: Array[Byte], v: Long, bits: Int): Unit = {
    val h1 = XxHash64Function.hash(v, LongType, 0L)
    val h2 = XxHash64Function.hash(v, LongType, 1L) | 1L
    val mask = bits - 1
    var i = 0
    while (i < K) {
      val p = ((h1 + i * h2) & mask).toInt
      buf(p >>> 3) = (buf(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** No false negatives: false proves no element was ever added. */
  def mightContain(buf: Array[Byte], v: Long): Boolean = {
    val bits = buf.length * 8
    val h1 = XxHash64Function.hash(v, LongType, 0L)
    val h2 = XxHash64Function.hash(v, LongType, 1L) | 1L
    val mask = bits - 1
    var i = 0
    while (i < K) {
      val p = ((h1 + i * h2) & mask).toInt
      if ((buf(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Codegen entry point: ANY array element hits the filter. Null array
    * elements are skipped (a null shingle never matched anything). */
  def anyContain(buf: Array[Byte], hashes: ArrayData): Boolean = {
    var i = 0
    while (i < hashes.numElements()) {
      if (!hashes.isNullAt(i) && mightContain(buf, hashes.getLong(i))) return true
      i += 1
    }
    false
  }
}
