package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group Bloom filter over a string key column — the Hudi BLOOM-index
  * analog (the reference's Hudi tables default to bloom-indexed upserts;
  * `CDC-Hudi-Notebook.zpln:292` relies on it for keyed-upsert file
  * routing). Aggregated per base FILE at compaction
  * (`groupBy(input_file_name())`, the same single stats pass that computes
  * key bounds), the filters answer "might this file contain this record
  * key?" with NO false negatives — so a point read can drop base files at
  * the LISTING level even when the requested keys are scattered across the
  * key-range order that min/max bounds prune on.
  *
  * Layout: `bits` bits (power of two), k = 5 probe positions per key via
  * Kirsch–Mitzenmacher double hashing over xxhash64 of the key's UTF-8
  * bytes (seeds 0 and 1; h2 forced odd). The SAME positions function is
  * used by the driver-side membership probe ([[KeyBloom.mightContain]]) —
  * one shared code path, no cross-layer drift.
  *
  * TypedImperativeAggregate with a byte[bits/8] buffer: partial aggregation
  * applies (per-task OR-merge), merge is bytewise OR — so filters are also
  * mergeable across files/commits if a caller wants a table-level filter.
  * At 100 TB the sizing lever is bits-per-file: 2^20 bits = 128 KiB gives
  * ~1% fpp at 10^5 keys/file; fpp only costs extra scanned files, never
  * correctness.
  */
case class KeyBloomAgg(
    child: Expression,
    bits: Int = 1 << 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(bits >= 64 && Integer.bitCount(bits) == 1,
    s"key_bloom_agg bits must be a power of two >= 64, got $bits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "key_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"key_bloom_agg expects a string key, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](bits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) KeyBloom.set(buf, v.asInstanceOf[UTF8String], bits)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KeyBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KeyBloomAgg =
    copy(child = newChildren.head)
}

/** `key_bloom_contains(filter, key)` — membership probe against a
  * [[KeyBloomAgg]] filter, as a codegen'd row expression. This is the
  * write-path index probe ([[graft.lake.MorTable.upsertIfNew]]): existing
  * table keys are scanned map-side against a BATCH-keys filter, so the
  * probe runs inside the scan stage of a key-column-only projection. */
case class KeyBloomContains(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "key_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"key_bloom_contains expects (BINARY, STRING), got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(filter: Any, key: Any): Any =
    KeyBloom.mightContainU(filter.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (f, k) =>
      s"${ev.value} = graft.functions.expr.KeyBloom.mightContainU($f, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KeyBloomContains =
    copy(left = newLeft, right = newRight)
}

object KeyBloomContains {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[KeyBloomContains].getName, "key_bloom_contains")
}

/** `key_bloom_contains_any(filter, keys)` — true iff ANY key of the
  * ARRAY<STRING> batch might be in the filter. The metadata-plane probe of
  * the SHARDED manifest stats relation ([[graft.lake.MorTable]]): a pruned
  * point read filters the per-file stats DataFrame with this predicate
  * cluster-side and collects only file NAMES — per-file blooms never
  * materialize on the driver. Probe positions depend only on (keys,
  * filter width); for the intended literal-keys call they are computed
  * once per width and cached on the expression instance (every row of one
  * stats relation shares the width). Rows-are-files cardinality, so
  * CodegenFallback is fine here — this never sits in a data hot path. */
case class KeyBloomContainsAny(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "key_bloom_contains_any"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"key_bloom_contains_any expects (BINARY, ARRAY<STRING>), got (${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val posCache =
    scala.collection.mutable.Map.empty[Int, Array[Array[Int]]]

  override protected def nullSafeEval(filter: Any, keys: Any): Any = {
    val buf = filter.asInstanceOf[Array[Byte]]
    val bits = buf.length * 8
    val pos =
      if (right.foldable) posCache.getOrElseUpdate(bits, positionsOf(keys, bits))
      else positionsOf(keys, bits)
    KeyBloom.anyMightContain(buf, pos)
  }

  private def positionsOf(keys: Any, bits: Int): Array[Array[Int]] = {
    val arr = keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ks = (0 until arr.numElements()).flatMap(i =>
      if (arr.isNullAt(i)) None else Some(arr.getUTF8String(i).toString))
    KeyBloom.positionsFor(ks, bits)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KeyBloomContainsAny =
    copy(left = newLeft, right = newRight)
}

object KeyBloomContainsAny {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[KeyBloomContainsAny].getName, "key_bloom_contains_any")
}

object KeyBloomAgg {
  val info: ExpressionInfo = new ExpressionInfo(classOf[KeyBloomAgg].getName, "key_bloom_agg")

  /** Bits from the optional second literal of `key_bloom_agg(key[, bits])`. */
  def bitsOf(exprs: Seq[Expression]): Int =
    if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
    else 1 << 16
}

/** The shared probe-position function and driver-side membership check. */
object KeyBloom {
  val K = 5

  /** k probe bit-positions for a key (Kirsch–Mitzenmacher: h1 + i·h2). */
  private def positions(key: UTF8String, bits: Int): Array[Int] = {
    val h1 = XxHash64Function.hash(key, StringType, 0L)
    val h2 = XxHash64Function.hash(key, StringType, 1L) | 1L
    val mask = bits - 1
    val out = new Array[Int](K)
    var i = 0
    while (i < K) { out(i) = ((h1 + i * h2) & mask).toInt; i += 1 }
    out
  }

  private[expr] def set(buf: Array[Byte], key: UTF8String, bits: Int): Unit = {
    val ps = positions(key, bits)
    var i = 0
    while (i < K) {
      val p = ps(i)
      buf(p >>> 3) = (buf(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** Probe positions for a key batch at one filter width — compute once,
    * test against every file's filter ([[anyMightContain]]). */
  def positionsFor(keys: Seq[String], bits: Int): Array[Array[Int]] = {
    require(bits >= 64 && Integer.bitCount(bits) == 1,
      s"bloom bit count $bits is not a power of two >= 64")
    keys.iterator.map(k => positions(UTF8String.fromString(k), bits)).toArray
  }

  /** True iff ANY of the precomputed key position-sets fully hits `buf`. */
  def anyMightContain(buf: Array[Byte], pos: Array[Array[Int]]): Boolean = {
    var k = 0
    while (k < pos.length) {
      val ps = pos(k)
      var i = 0
      var hit = true
      while (hit && i < ps.length) {
        val p = ps(i)
        if ((buf(p >>> 3) & (1 << (p & 7))) == 0) hit = false
        i += 1
      }
      if (hit) return true
      k += 1
    }
    false
  }

  /** No false negatives: a false here proves the key was never added. */
  def mightContain(buf: Array[Byte], key: String): Boolean =
    mightContainU(buf, UTF8String.fromString(key))

  /** [[mightContain]] over the codegen-native string type (no copy). */
  def mightContainU(buf: Array[Byte], key: UTF8String): Boolean = {
    val bits = buf.length * 8
    require(bits >= 64 && Integer.bitCount(bits) == 1,
      s"bloom buffer length ${buf.length} is not a power-of-two bit count")
    val ps = positions(key, bits)
    var i = 0
    while (i < K) {
      val p = ps(i)
      if ((buf(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}
