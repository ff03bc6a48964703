package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ENGINE-PORTABLE SimHash: 64-bit signature as 4×16-bit chunks where each
  * token's sign bits come from the first 8 md5 bytes of the token —
  * DuckDB's `('0x' || substr(md5(t), 1, 16))::UBIGINT`, bit j via
  * `(h >> j) & 1`. Bit j of the signature is set iff strictly more tokens
  * have bit j set than clear (2·ones > n). Tokens are the multiset from
  * lowercase whitespace splitting (repeats weigh in, order doesn't).
  *
  * The splitmix-family [[SimHashChunks]]+[[TokenHashes]] pair stays the
  * production path (no digest per token); this expression exists so the
  * SimHash signature itself is hash-checkable against an independent
  * engine (entry d9) — the same portability trick as `minhash_md5` (d8)
  * and the md5 winnowing fingerprint (t7).
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(textAny: Any): Any = {
    val text = textAny.asInstanceOf[UTF8String].toLowerCase.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](64)
    // one digest per DISTINCT token, weighted by its count — n identical
    // tokens contribute n × the same ±1 vector, so counting first gives the
    // same sums with far fewer md5 calls on natural (Zipf-heavy) text
    val counts = new java.util.HashMap[String, Int]()
    text.split("\\s+").iterator.filter(_.nonEmpty).foreach { tok =>
      counts.merge(tok, 1, Integer.sum): Unit
    }
    counts.forEach { (tok, n) =>
      md.reset()
      val d = md.digest(tok.getBytes("UTF-8"))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) sums(j) += n else sums(j) -= n
        j += 1
      }
    }
    val chunks = new Array[Long](4)
    var c = 0
    while (c < 4) {
      var v = 0L; var j = 0
      while (j < 16) { if (sums(c * 16 + j) > 0) v |= (1L << j); j += 1 }
      chunks(c) = v; c += 1
    }
    new GenericArrayData(chunks)
  }

  /** Row kernel for generated code (the same method interpreted eval runs). */
  def compute(text: AnyRef): ArrayData =
    nullSafeEval(text).asInstanceOf[ArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("simhashMd5", this, classOf[SimHashMd5].getName)
      s"${ev.value} = $ref.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {
  val info: ExpressionInfo = new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5")
}
