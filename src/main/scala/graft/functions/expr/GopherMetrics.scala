package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gopher_metrics(text)` — the full Gopher repetition/quality rule set
  * (Rae et al. 2021 §A1.1) as ONE compiled pass per row, returning a
  * struct of every metric plus the published-threshold pass flag.
  *
  * Why native: the declarative reference
  * (`graft.functions.TextAnalysis.gopherRules`) needs interpreted
  * higher-order filters for the line rules AND an explode + two-level
  * groupBy for the top-bigram mode — cross-row machinery for what is a
  * strictly per-document statistic. This kernel computes the bigram mode
  * in a per-row hash map, so the whole rule set is map-only: at 100 TB
  * the quality gate runs inside the scan with ZERO shuffles and nothing
  * leaves WholeStageCodegen. The declarative form stays the documented
  * reference, pinned equal over the corpus in TextAnalysisSpec.
  *
  * Semantics replicate the declarative/DuckDB formulas bit-for-bit:
  * code-point lengths (Spark `length`), Java-regex `\s` token/line
  * boundaries, left-to-right non-overlapping `#|\.\.\.` symbol scan,
  * binary (UTF8String) tie-break for the top bigram — max count, then
  * lexicographically largest pair, matching `max(struct(c, w1, w2))` —
  * and every ratio rounded HALF_UP to 6 before the threshold tests.
  */
case class GopherMetrics(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_metrics expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = GopherMetrics.Schema
  override def prettyName: String = "gopher_metrics"

  import GopherMetrics._

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(sAny: AnyRef): InternalRow = {
    val text = sAny.asInstanceOf[UTF8String].toString

    // non-whitespace CODE POINTS (== length(regexp_replace(t, "\s+", "")))
    var chars = 0
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      if (!isWs(cp)) chars += 1
      ci += Character.charCount(cp)
    }

    // '#' / '...' occurrences, left-to-right non-overlapping — exactly
    // regexp_count(t, "#|\.\.\.")
    var sym = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '#') { sym += 1; i += 1 }
      else if (c == '.' && i + 2 < text.length &&
        text.charAt(i + 1) == '.' && text.charAt(i + 2) == '.') { sym += 1; i += 3 }
      else i += 1
    }

    // whitespace tokens of the lowercased text
    val toks = WsRe.split(text.toLowerCase(java.util.Locale.ROOT), -1)
      .filter(_.nonEmpty)
    val nTok = toks.length
    var alpha = 0
    var ti = 0
    while (ti < nTok) {
      val w = toks(ti)
      var j = 0
      var hit = false
      while (j < w.length && !hit) { val wc = w.charAt(j); hit = wc >= 'a' && wc <= 'z'; j += 1 }
      if (hit) alpha += 1
      ti += 1
    }

    // non-empty lines / paragraphs of the ORIGINAL text
    val lines = text.split("\n", -1).filter(_.nonEmpty)
    val paras = text.split("\n\n", -1).filter(_.nonEmpty)
    val distinctLines = new java.util.HashSet[String](java.util.Arrays.asList(lines: _*)).size
    val distinctParas = new java.util.HashSet[String](java.util.Arrays.asList(paras: _*)).size
    var bullets = 0
    var ellipses = 0
    var li = 0
    while (li < lines.length) {
      val l = lines(li)
      var j = 0
      while (j < l.length && isWs(l.charAt(j).toInt)) j += 1
      if (j < l.length && (l.charAt(j) == '-' || l.charAt(j) == '*')) bullets += 1
      if (l.endsWith("...")) ellipses += 1
      li += 1
    }

    // per-doc top bigram: max count, ties -> binary-largest (w1, w2) —
    // the same total order as max(struct(c, w1, w2)). Tokens contain no
    // whitespace, so "w1 w2" is an unambiguous map key.
    var bestC = 0
    var bestW1: String = null
    var bestW2: String = null
    if (nTok >= 2) {
      val m = new java.util.HashMap[String, Int](Math.min(nTok * 2, 1 << 16))
      var k = 0
      while (k < nTok - 1) {
        val key = toks(k) + " " + toks(k + 1)
        m.put(key, m.getOrDefault(key, 0) + 1)
        k += 1
      }
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val sp = e.getKey.indexOf(' ')
        val w1 = e.getKey.substring(0, sp)
        val w2 = e.getKey.substring(sp + 1)
        val c = e.getValue
        val better = c > bestC || (c == bestC && {
          val c1 = binCmp(w1, bestW1)
          c1 > 0 || (c1 == 0 && binCmp(w2, bestW2) > 0)
        })
        if (better) { bestC = c; bestW1 = w1; bestW2 = w2 }
      }
    }

    val nW = math.max(nTok, 1)
    val nL = math.max(lines.length, 1)
    val nP = math.max(paras.length, 1)
    val dupLine = round6(1.0 - distinctLines.toDouble / nL)
    val dupPara = round6(1.0 - distinctParas.toDouble / nP)
    val symR = round6(sym.toDouble / nW)
    val alphaR = round6(alpha.toDouble / nW)
    val meanLen = round6(chars.toDouble / nW)
    val bulletR = round6(bullets.toDouble / nL)
    val ellipsisR = round6(ellipses.toDouble / nL)
    val topFrac = if (bestC == 0) 0.0
      else round6(bestC.toDouble * (cpLen(bestW1) + cpLen(bestW2)) / math.max(chars, 1))
    val pass = nTok >= 50 && nTok <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symR <= 0.1 && alphaR >= 0.8 &&
      bulletR <= 0.9 && ellipsisR <= 0.3 &&
      dupLine <= 0.3 && dupPara <= 0.3 && topFrac <= 0.2
    new GenericInternalRow(Array[Any](nTok.toLong, dupLine, dupPara, symR,
      alphaR, meanLen, bulletR, ellipsisR, topFrac, pass))
  }

  override protected def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("gopherMetrics", this, classOf[GopherMetrics].getName)
      s"$ref.compute($s)"
    })

  override protected def withNewChildInternal(newChild: Expression): GopherMetrics =
    copy(child = newChild)
}

object GopherMetrics {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GopherMetrics].getName, "gopher_metrics")

  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_para_frac", DoubleType, nullable = false),
    StructField("symbol_word_ratio", DoubleType, nullable = false),
    StructField("alpha_word_frac", DoubleType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("top_bigram_char_frac", DoubleType, nullable = false),
    StructField("gopher_pass", BooleanType, nullable = false)))

  /** Java regex `\s` — ASCII whitespace only, NOT Character.isWhitespace. */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  /** UTF-8 binary order (what UTF8String / struct max compare). */
  private def binCmp(a: String, b: String): Int =
    if (b == null) 1
    else UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** Spark `length()` counts code points. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** SQL ROUND as Spark's Round on doubles: decimal-string BigDecimal,
    * HALF_UP. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
