package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text → distinct word-k-shingle hashes (array<long>, in
  * [0, 2^31-1)), the MinHash front end.
  *
  * The declarative pipeline (lower → split → filter → transform(slice →
  * concat_ws) → array_distinct → transform(xxhash64)) materializes every
  * shingle as a string and runs interpreted per element. This expression
  * does one pass: tokenize, hash each token (FNV-1a over its bytes), and
  * chain k token hashes with a splitmix-style mix — a k-shingle never
  * exists as a string at all. Distinctness via a small hash set.
  *
  * `raw = true` (SQL name `shingle_hashes64`) keeps the full 64-bit mixed
  * hash instead of reducing mod 2^31-1 — for set-arithmetic consumers
  * (exact Jaccard via inverted index) where collision probability must be
  * negligible rather than merely small. MinHash keeps the mod-P form (its
  * universal-hash family needs values < P).
  *
  * Codegen emits a call to the same compiled kernel (string work doesn't
  * benefit from expression fusing), so the surrounding Project keeps its
  * whole-stage span instead of falling back. Hash family differs from the
  * declarative form — both are valid MinHash inputs; family-independent
  * behavior (LSH recall, estimate accuracy) is what DedupSpec asserts.
  */
case class ShingleHashes(left: Expression, right: Expression, raw: Boolean = false,
                         positional: Boolean = false)
    extends BinaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects (string, literal int k), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (positional) "shingle_hashes_pos"
    else if (raw) "shingle_hashes64" else "shingle_hashes"

  private def finish(acc: Long): Long =
    if (raw) acc else java.lang.Long.remainderUnsigned(acc, P)

  private def mix(acc: Long, x: Long): Long = {
    var z = acc ^ (x + 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(textAny: Any, kAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].toLowerCase.getBytes
    val k = kAny.asInstanceOf[Int]
    // tokenize + FNV-1a per token, single scan
    val tokenHashes = new java.util.ArrayList[Long]()
    var h = 0xcbf29ce484222325L; var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
      if (ws) {
        if (inTok) { tokenHashes.add(h); h = 0xcbf29ce484222325L; inTok = false }
      } else {
        h = (h ^ (b & 0xffL)) * 0x100000001b3L
        inTok = true
      }
      i += 1
    }
    if (inTok) tokenHashes.add(h)
    val n = tokenHashes.size()
    if (positional) {
      // Positional mode (`shingle_hashes_pos`): one 64-bit window hash PER
      // START POSITION, array index == token offset of the window — the
      // front end for exact substring-span dedup, where WHERE a duplicated
      // window sits matters as much as THAT it exists. No distinct, no
      // degenerate short-text shingle: a doc with fewer than k tokens has
      // zero k-windows by definition.
      val m = if (n >= k) n - k + 1 else 0
      val pos = new Array[Long](m)
      var s = 0
      while (s < m) {
        var acc = 0L; var j = 0
        while (j < k) { acc = mix(acc, tokenHashes.get(s + j)); j += 1 }
        pos(s) = acc
        s += 1
      }
      return new GenericArrayData(pos)
    }
    val out = new java.util.HashSet[Long]()
    if (n == 0) {
      // empty text → single hash of the empty shingle (matches the
      // declarative form's "whole text as one shingle" degenerate case)
      out.add(finish(mix(0L, 0L)))
    } else if (n < k) {
      var acc = 0L; var j = 0
      while (j < n) { acc = mix(acc, tokenHashes.get(j)); j += 1 }
      out.add(finish(acc))
    } else {
      var s = 0
      while (s + k <= n) {
        var acc = 0L; var j = 0
        while (j < k) { acc = mix(acc, tokenHashes.get(s + j)); j += 1 }
        out.add(finish(acc))
        s += 1
      }
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator(); var m = 0
    while (it.hasNext) { arr(m) = it.next(); m += 1 }
    new GenericArrayData(arr)
  }

  /** Row kernel for generated code (the same method interpreted eval runs). */
  def compute(text: AnyRef, k: Int): ArrayData =
    nullSafeEval(text, k).asInstanceOf[ArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, kk) => {
      val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
      s"${ev.value} = $ref.compute($t, $kk);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "shingle_hashes")
  val info64: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "shingle_hashes64")
  val infoPos: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "shingle_hashes_pos")
}
