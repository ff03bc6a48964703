package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `text_quality(text)` — the composite pretraining quality score of
  * `graft.functions.TextAnalysis.qualityScore`, as ONE compiled pass per
  * row.
  *
  * Why native: the declarative form tokenizes the text three times
  * (count, stopword filter, non-space length) and runs the stopword check
  * as an interpreted `filter`/`array_contains` higher-order fold — the
  * exact hot-per-row-loop shape this repo's build rule sends to
  * `graft.functions.expr`. On a 100 TB text scan the quality gate IS the
  * scan, so it must stay inside WholeStageCodegen.
  *
  * Semantics replicate the declarative/DuckDB formula bit-for-bit (pinned
  * in TextAnalysisSpec; oracle entries t4/t8): code-point lengths
  * (Spark's `length`), Java-regex `\s+` token boundaries, the 18-word
  * English stopword list, ratios rounded HALF_UP to 6 before the
  * threshold tests, score rounded to 4.
  */
case class TextQuality(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"text_quality expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "text_quality"

  import TextQuality._

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(sAny: AnyRef): Double = {
    val text = sAny.asInstanceOf[UTF8String].toString
    // counts in CODE POINTS, matching Spark's length() on strings
    var nChars = 0; var nonspace = 0; var punct = 0
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      nChars += 1
      if (!isWs(cp)) nonspace += 1
      cp match {
        case '.' | ',' | '!' | '?' | ';' | ':' => punct += 1
        case _ => ()
      }
      ci += Character.charCount(cp)
    }
    var nTok = 0; var sw = 0
    val parts = WsRe.split(text, -1)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        nTok += 1
        if (Stop.contains(parts(i).toLowerCase(java.util.Locale.ROOT))) sw += 1
      }
      i += 1
    }
    val punctR = round6(punct.toDouble / math.max(nChars, 1))
    val swr = round6(sw.toDouble / math.max(nTok, 1))
    val meanTokLen = nonspace.toDouble / math.max(nTok, 1)
    val lenOk = if (nTok >= 10 && nTok <= 100000) 1.0 else 0.0
    val punctOk = if (punctR < 0.1) 1.0 else 0.0
    val swOk = if (swr >= 0.05 && swr <= 0.7) 1.0 else 0.0
    val tokLenOk = if (meanTokLen >= 2.0 && meanTokLen <= 12.0) 1.0 else 0.0
    round4((lenOk + punctOk + swOk + tokLenOk) / 4.0)
  }

  override protected def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("textQuality", this, classOf[TextQuality].getName)
      s"$ref.compute($s)"
    })

  override protected def withNewChildInternal(newChild: Expression): TextQuality =
    copy(child = newChild)
}

object TextQuality {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TextQuality].getName, "text_quality")

  /** Java regex `\s` (what split("\\s+") and regexp_replace see) — ASCII
    * whitespace only, NOT Character.isWhitespace. */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private val WsRe = java.util.regex.Pattern.compile("\\s+")

  /** graft.functions.TextAnalysis.EnStopwords, frozen here so the compiled
    * kernel has no per-row collection traversal (18-entry hash set). */
  private val Stop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
      "for", "on", "with", "as", "was", "at", "by").foreach(s.add)
    s
  }

  /** SQL ROUND exactly as Spark's Round on doubles: BigDecimal.valueOf
    * (decimal-STRING construction — `new BigDecimal(double)` takes the
    * exact binary expansion and rounds ties differently), HALF_UP. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
}
