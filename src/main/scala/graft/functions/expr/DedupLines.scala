package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dedup_lines(text)` — within-document duplicate-line removal in one
  * compiled pass: split on `\n`, drop empty lines, keep the FIRST
  * occurrence of each distinct line in order, rejoin with `\n`. Returns
  * `struct(clean_text, n_lines, n_kept)`.
  *
  * Why native: the declarative keep-first filter
  * (`graft.functions.TextAnalysis.dedupLines`) probes
  * `array_position(lines, l)` per line — an O(n²)-per-document
  * interpreted fold. This kernel is a hash-set scan, O(n) per document,
  * and stays inside WholeStageCodegen; the cleaning rewrite of a 100 TB
  * corpus is map-only either way, but the per-row cost is the whole
  * cost. Line identity is exact string equality (binary — the same
  * comparison `array_distinct`/`array_position` use). */
case class DedupLines(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dedup_lines expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = DedupLines.Schema
  override def prettyName: String = "dedup_lines"

  /** Row kernel, shared by interpreted eval and codegen. */
  def compute(sAny: AnyRef): InternalRow = {
    val text = sAny.asInstanceOf[UTF8String].toString
    val lines = text.split("\n", -1)
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(text.length)
    var n = 0
    var kept = 0
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.nonEmpty) {
        n += 1
        if (seen.add(l)) {
          if (kept > 0) sb.append('\n')
          sb.append(l)
          kept += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), n.toLong, kept.toLong))
  }

  override protected def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("dedupLines", this, classOf[DedupLines].getName)
      s"$ref.compute($s)"
    })

  override protected def withNewChildInternal(newChild: Expression): DedupLines =
    copy(child = newChild)
}

object DedupLines {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DedupLines].getName, "dedup_lines")

  val Schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false)))
}
