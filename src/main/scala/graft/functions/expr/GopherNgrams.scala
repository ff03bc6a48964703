package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gopher_ngrams(text)` — the rest of the published Gopher repetition
  * rule family (Rae et al. 2021 §A1.1), ONE compiled pass per row:
  *
  *  - `top_{3,4}gram_char_frac`: characters inside the single
  *    most-repeated word n-gram, over all token characters (count ×
  *    n-gram token chars / total token chars). Tie-break is total and
  *    engine-portable: max count, then binary-largest space-joined gram.
  *  - `dup_{5..10}gram_char_frac`: characters COVERED by any occurrence
  *    of a duplicated n-gram (union of covered token positions — overlap
  *    counted once), over all token characters.
  *  - `repetition_pass`: the paper's thresholds (top3 ≤ .18, top4 ≤ .16,
  *    dup5..dup10 ≤ .15/.14/.13/.12/.11/.10) on the 6-dp-rounded values.
  *
  * The 2-gram member of the family lives in [[GopherMetrics]] (threshold
  * .20). Why native: each document needs per-n occurrence counting plus
  * a coverage-union sweep — strictly per-row statistics that the
  * declarative twin (`TextAnalysis.gopherNgrams`) can only express as
  * per-n explodes + doc-keyed groupBys. Here it is a handful of hash
  * maps over one token array: map-only at any corpus size, inside
  * WholeStageCodegen.
  */
case class GopherNgrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_ngrams expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = GopherNgrams.Schema
  override def prettyName: String = "gopher_ngrams"

  import GopherNgrams._

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(sAny: AnyRef): InternalRow = {
    val text = sAny.asInstanceOf[UTF8String].toString
    val toks = WsRe.split(text.toLowerCase(java.util.Locale.ROOT), -1)
      .filter(_.nonEmpty)
    val nTok = toks.length
    // numerator lengths: LOWERCASED token code points (grams are built
    // from the lowercased tokens, so covered-char sums and the joined
    // gram's length both live in the lowercased domain)
    val tokLen = new Array[Int](nTok)
    var ti = 0
    while (ti < nTok) {
      tokLen(ti) = toks(ti).codePointCount(0, toks(ti).length)
      ti += 1
    }
    // denominator: the ORIGINAL text's non-whitespace code points — the
    // declarative twin and the oracle use length(regexp_replace(text,
    // '\s+', '')). Summing LOWERCASED token lengths instead diverges on
    // code-point-expanding lowercases (U+0130 → 'i' + combining dot).
    var chars = 0
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      if (!isWs(cp)) chars += 1
      ci += Character.charCount(cp)
    }
    val denom = math.max(chars, 1).toDouble

    /** Space-joined [i, i+n) gram key. */
    def gram(i: Int, n: Int): String = {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      sb.toString
    }

    /** Most-repeated n-gram's char fraction (0 when no n-gram exists). */
    def topFrac(n: Int): Double = {
      if (nTok < n) return 0.0
      val m = new java.util.HashMap[String, Int]()
      var i = 0
      while (i <= nTok - n) {
        val k = gram(i, n)
        m.put(k, m.getOrDefault(k, 0) + 1)
        i += 1
      }
      var bestC = 0
      var bestG: String = null
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val better = e.getValue > bestC || (e.getValue == bestC &&
          UTF8String.fromString(e.getKey).compareTo(UTF8String.fromString(bestG)) > 0)
        if (better) { bestC = e.getValue; bestG = e.getKey }
      }
      // joined-gram code points minus the n-1 separator spaces
      val gramChars = bestG.codePointCount(0, bestG.length) - (n - 1)
      round6(bestC.toDouble * gramChars / denom)
    }

    /** Chars covered by any occurrence of a duplicated n-gram (union of
      * covered token positions), as a fraction of all token chars. */
    def dupFrac(n: Int): Double = {
      if (nTok < n) return 0.0
      val m = new java.util.HashMap[String, Int]()
      var i = 0
      while (i <= nTok - n) {
        val k = gram(i, n)
        m.put(k, m.getOrDefault(k, 0) + 1)
        i += 1
      }
      val covered = new Array[Boolean](nTok)
      i = 0
      while (i <= nTok - n) {
        if (m.get(gram(i, n)) >= 2) {
          var j = i
          while (j < i + n) { covered(j) = true; j += 1 }
        }
        i += 1
      }
      var sum = 0L
      var j = 0
      while (j < nTok) { if (covered(j)) sum += tokLen(j); j += 1 }
      round6(sum / denom)
    }

    val t3 = topFrac(3); val t4 = topFrac(4)
    val d5 = dupFrac(5); val d6 = dupFrac(6); val d7 = dupFrac(7)
    val d8 = dupFrac(8); val d9 = dupFrac(9); val d10 = dupFrac(10)
    val pass = t3 <= 0.18 && t4 <= 0.16 && d5 <= 0.15 && d6 <= 0.14 &&
      d7 <= 0.13 && d8 <= 0.12 && d9 <= 0.11 && d10 <= 0.10
    new GenericInternalRow(Array[Any](t3, t4, d5, d6, d7, d8, d9, d10, pass))
  }

  override protected def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("gopherNgrams", this, classOf[GopherNgrams].getName)
      s"$ref.compute($s)"
    })

  override protected def withNewChildInternal(newChild: Expression): GopherNgrams =
    copy(child = newChild)
}

object GopherNgrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GopherNgrams].getName, "gopher_ngrams")

  val Schema: StructType = StructType(Seq(
    StructField("top_3gram_char_frac", DoubleType, nullable = false),
    StructField("top_4gram_char_frac", DoubleType, nullable = false),
    StructField("dup_5gram_char_frac", DoubleType, nullable = false),
    StructField("dup_6gram_char_frac", DoubleType, nullable = false),
    StructField("dup_7gram_char_frac", DoubleType, nullable = false),
    StructField("dup_8gram_char_frac", DoubleType, nullable = false),
    StructField("dup_9gram_char_frac", DoubleType, nullable = false),
    StructField("dup_10gram_char_frac", DoubleType, nullable = false),
    StructField("repetition_pass", BooleanType, nullable = false)))

  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  /** Java regex `\s` — ASCII whitespace only, NOT Character.isWhitespace. */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
