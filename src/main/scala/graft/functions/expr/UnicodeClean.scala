package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_clean(text)` — the Unicode-hygiene pass every web-scale
  * curation pipeline runs before anything tokenizes (mixed-encoding
  * scrapes carry decomposed accents, stray C0 controls, and CRLF soup
  * that silently fragment vocabularies and break exact dedup):
  *
  *  1. line-ending normalization: `\r\n` and lone `\r` → `\n`;
  *  2. control strip: C0 controls except `\n`/`\t`, plus DEL (0x7F);
  *  3. Unicode NFC normalization (composed forms — "e + combining
  *     acute" becomes "é", so byte-level dedup/fingerprinting sees one
  *     spelling).
  *
  * Returns (clean_text, n_before, n_after, changed) — counts are CODE
  * POINTS; callers hash clean_text with Spark's own `md5`. One compiled
  * pass per row, map-only, WholeStageCodegen: at 100 TB this runs
  * inside the scan with zero shuffles. Spark has no built-in NFC, so
  * the kernel IS the implementation — the correctness reference is the
  * DuckDB oracle (`nfc_normalize` + the same CR/control rewrites,
  * entry t41), which must agree byte-for-byte via md5. NFC runs LAST
  * (on the stripped text) on both engines.
  */
case class UnicodeClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_clean expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = UnicodeClean.Schema
  override def prettyName: String = "unicode_clean"

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(sAny: AnyRef): InternalRow = {
    val text = sAny.asInstanceOf[UTF8String].toString
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\r') {
        // \r\n collapses to the following \n; a lone \r becomes \n
        if (i + 1 >= text.length || text.charAt(i + 1) != '\n') sb.append('\n')
      } else if ((c < 0x20 && c != '\n' && c != '\t') || c == 0x7F) {
        () // strip C0 control / DEL
      } else sb.append(c)
      i += 1
    }
    val cleaned = java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(cleaned),
      text.codePointCount(0, text.length).toLong,
      cleaned.codePointCount(0, cleaned.length).toLong,
      cleaned != text))
  }

  override protected def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("unicodeClean", this, classOf[UnicodeClean].getName)
      s"$ref.compute($s)"
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeClean =
    copy(child = newChild)
}

object UnicodeClean {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[UnicodeClean].getName, "unicode_clean")

  val Schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_before", LongType, nullable = false),
    StructField("n_after", LongType, nullable = false),
    StructField("changed", BooleanType, nullable = false)))
}
