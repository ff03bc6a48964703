package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id(text)` — the {en,es,de,fr,zh} heuristic of
  * `graft.functions.TextAnalysis.langId`, as ONE compiled pass per row.
  *
  * The declarative form tokenizes the lowered text and runs FOUR
  * interpreted `filter`/`array_contains` folds (one per stopword
  * profile) plus a CJK regexp_replace — per row. Here: one tokenize, one
  * hash probe per token into four 18-word sets, one code-point sweep for
  * the CJK ratio. Decision order, tie-breaks, and double arithmetic
  * replicate the declarative expression exactly (pinned in
  * TextAnalysisSpec): CJK ratio > 0.05 → zh; es > en ∧ es ≥ de ∧ es ≥ fr
  * → es; de > en ∧ de ≥ fr → de; fr > en → fr; else en. */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  import LangId._

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(sAny: AnyRef): UTF8String = {
    val raw = sAny.asInstanceOf[UTF8String]
    val text = raw.toString
    // CJK ratio over code points (Spark's length semantics)
    var nChars = 0; var cjk = 0
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      nChars += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      ci += Character.charCount(cp)
    }
    val cjkRatio = cjk.toDouble / math.max(nChars, 1)
    if (cjkRatio > 0.05) return Zh
    // tokens of lower(text), Java-regex \s+ boundaries — same as the
    // declarative tokens(lower(text))
    val lowered = raw.toLowerCase.toString
    val parts = WsRe.split(lowered, -1)
    var nTok = 0; var en = 0; var es = 0; var de = 0; var fr = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty) {
        nTok += 1
        if (EnSet.contains(t)) en += 1
        if (EsSet.contains(t)) es += 1
        if (DeSet.contains(t)) de += 1
        if (FrSet.contains(t)) fr += 1
      }
      i += 1
    }
    val d = math.max(nTok, 1).toDouble
    val enR = en / d; val esR = es / d; val deR = de / d; val frR = fr / d
    if (esR > enR && esR >= deR && esR >= frR) Es
    else if (deR > enR && deR >= frR) De
    else if (frR > enR) Fr
    else En
  }

  override protected def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("langId", this, classOf[LangId].getName)
      s"$ref.compute($s)"
    })

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  val info: ExpressionInfo = new ExpressionInfo(classOf[LangId].getName, "lang_id")

  private val WsRe = java.util.regex.Pattern.compile("\\s+")
  private def set(ws: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](); ws.foreach(s.add); s
  }
  // frozen copies of TextAnalysis.{En,Es,De,Fr}Stopwords (equality of the
  // two paths is pinned in TextAnalysisSpec, so drift fails the build)
  private val EnSet = set(Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "was", "at", "by"))
  private val EsSet = set(Seq("el", "la", "los", "las", "un", "una", "y",
    "o", "de", "en", "es", "que", "por", "con", "para", "del", "se", "no"))
  private val DeSet = set(Seq("der", "die", "das", "ein", "eine", "und",
    "oder", "von", "zu", "im", "ist", "dass", "für", "auf", "mit", "als", "den"))
  private val FrSet = set(Seq("le", "la", "les", "un", "une", "et", "ou",
    "de", "en", "est", "que", "pour", "sur", "avec", "du", "au", "des", "ne"))

  private val En = UTF8String.fromString("en")
  private val Es = UTF8String.fromString("es")
  private val De = UTF8String.fromString("de")
  private val Fr = UTF8String.fromString("fr")
  private val Zh = UTF8String.fromString("zh")
}
