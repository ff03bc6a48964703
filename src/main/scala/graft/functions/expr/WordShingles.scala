package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text → word-k-shingle STRINGS (array<string>), bit-identical to
  * the declarative reference form
  *
  * {{{
  *   toks = filter(split(lower(text), "\\s+"), _ != "")
  *   when(size(toks) >= k,
  *        [array_distinct](transform(sequence(0, size(toks)-k),
  *          i => concat_ws(" ", slice(toks, i+1, k)))))
  *     .otherwise(array(concat_ws(" ", toks)))
  * }}}
  *
  * which that pipeline evaluates INTERPRETED: `transform` is a
  * CodegenFallback higher-order function, and each of its elements pays a
  * `slice` copy plus a `concat_ws` over it — O(n·k) interpreted work per
  * row on the hottest text path in the suite (t29 boilerplate mining
  * explodes ~90 windows per document). This expression does one compiled
  * pass: tokenize on the same Java-regex `\s` class (space, \t, \n, \x0B,
  * \f, \r — ASCII bytes, safe to scan positionally in UTF-8), then emit
  * each window as one `UTF8String` built from the token spans with single
  * separators. The shingle strings are exactly the reference's — hash
  * family consumers stay on [[ShingleHashes]]; this is for operators whose
  * OUTPUT is the shingle itself.
  *
  * `distinct = true` (SQL `word_shingles_distinct`) keeps the first
  * occurrence of each shingle in window order — `array_distinct` semantics
  * — for set consumers (n-gram Jaccard). Degenerate cases match the
  * reference: fewer than k tokens (including zero) yield ONE shingle of
  * all tokens joined ("" for empty text).
  *
  * Equality with the declarative form is pinned by a spec over the
  * documents corpus (DedupSpec "word_shingles kernel == declarative
  * reference").
  */
case class WordShingles(left: Expression, right: Expression,
                        distinct: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (string, literal int k), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (distinct) "word_shingles_distinct" else "word_shingles"

  override protected def nullSafeEval(textAny: Any, kAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].toLowerCase.getBytes
    val k = kAny.asInstanceOf[Int]
    // token spans (start, end) — Java regex \s byte class; multibyte UTF-8
    // chars never contain bytes < 0x80, so a positional byte scan is exact
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0; var tokStart = -1
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (ws) {
        if (tokStart >= 0) { starts.add(tokStart); ends.add(i); tokStart = -1 }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) { starts.add(tokStart); ends.add(bytes.length) }
    val n = starts.size()

    // one shingle = tokens [s, s+len) joined by single spaces
    def shingle(s: Int, len: Int): UTF8String = {
      var bytesLen = if (len > 0) len - 1 else 0
      var j = 0
      while (j < len) { bytesLen += ends.get(s + j) - starts.get(s + j); j += 1 }
      val out = new Array[Byte](bytesLen)
      var pos = 0; j = 0
      while (j < len) {
        if (j > 0) { out(pos) = ' '; pos += 1 }
        val st = starts.get(s + j); val ln = ends.get(s + j) - st
        System.arraycopy(bytes, st, out, pos, ln)
        pos += ln
        j += 1
      }
      UTF8String.fromBytes(out)
    }

    if (n < k) return new GenericArrayData(Array[Any](shingle(0, n)))
    val m = n - k + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var s = 0
      while (s < m) { seen.add(shingle(s, k)); s += 1 }
      val arr = new Array[Any](seen.size())
      val it = seen.iterator(); var o = 0
      while (it.hasNext) { arr(o) = it.next(); o += 1 }
      new GenericArrayData(arr)
    } else {
      val arr = new Array[Any](m)
      var s = 0
      while (s < m) { arr(s) = shingle(s, k); s += 1 }
      new GenericArrayData(arr)
    }
  }

  /** Row kernel for generated code (the same method interpreted eval runs). */
  def compute(text: AnyRef, k: Int): ArrayData =
    nullSafeEval(text, k).asInstanceOf[ArrayData]

  // NULL text behaves as "" (→ one empty shingle): the declarative
  // reference's otherwise-branch `array(concat_ws(" ", toks))` skips the
  // NULL and yields [""], so a null-INTOLERANT eval here would silently
  // drop NULL-text rows from explode() consumers that previously counted
  // them. Only a NULL k (never the case for the literal-k SQL surface)
  // makes the result NULL.
  override def nullable: Boolean = right.nullable

  override def eval(input: InternalRow): Any = {
    val kAny = right.eval(input)
    if (kAny == null) null
    else {
      val tAny = left.eval(input)
      nullSafeEval(if (tAny == null) UTF8String.EMPTY_UTF8 else tAny, kAny)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val empty = "org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8"
    val javaType = CodeGenerator.javaType(dataType)
    if (nullable) {
      ev.copy(code = code"""
        ${rg.code}
        boolean ${ev.isNull} = ${rg.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${lg.code}
          ${ev.value} = $ref.compute(${lg.isNull} ? $empty : (Object) ${lg.value}, ${rg.value});
        }""")
    } else {
      ev.copy(code = code"""
        ${rg.code}
        ${lg.code}
        $javaType ${ev.value} = $ref.compute(${lg.isNull} ? $empty : (Object) ${lg.value}, ${rg.value});""",
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordShingles].getName, "word_shingles")
  val infoDistinct: ExpressionInfo = new ExpressionInfo(
    classOf[WordShingles].getName, "word_shingles_distinct")
}
