package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text → per-token 64-bit hashes (array<long>, MULTISET — one
  * element per token occurrence, order preserved), the SimHash front end.
  *
  * Same single-scan tokenizer as [[ShingleHashes]] (lowercase, ASCII
  * whitespace split, FNV-1a over token bytes) without the shingling or the
  * dedup: SimHash weights repeated tokens, so the multiset matters. The
  * declarative form `transform(tokens(lower(text)), xxhash64)` runs
  * interpreted per element (Spark higher-order functions are
  * CodegenFallback) — this is one compiled method per row.
  */
case class TokenHashes(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_hashes expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override protected def nullSafeEval(textAny: Any): Any = {
    val bytes = textAny.asInstanceOf[UTF8String].toLowerCase.getBytes
    val out = new java.util.ArrayList[Long]()
    var h = 0xcbf29ce484222325L; var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
      if (ws) {
        if (inTok) { out.add(h); h = 0xcbf29ce484222325L; inTok = false }
      } else {
        h = (h ^ (b & 0xffL)) * 0x100000001b3L
        inTok = true
      }
      i += 1
    }
    if (inTok) out.add(h)
    val arr = new Array[Long](out.size())
    var m = 0
    while (m < arr.length) { arr(m) = out.get(m); m += 1 }
    new GenericArrayData(arr)
  }

  /** Row kernel for generated code (the same method interpreted eval runs). */
  def compute(text: AnyRef): ArrayData =
    nullSafeEval(text).asInstanceOf[ArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("tokenHashes", this, classOf[TokenHashes].getName)
      s"${ev.value} = $ref.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenHashes].getName, "token_hashes")
}
