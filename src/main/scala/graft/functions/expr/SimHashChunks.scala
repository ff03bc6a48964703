package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash: array<long> token hashes → 4×16-bit chunks (array<long>),
  * bit k = sign of Σ_tokens ±1 where the per-(bit, token) sign comes from a
  * cheap avalanche remix of (token hash, bit) — one multiply/xor chain, no
  * per-bit xxhash64 call.
  *
  * Semantics match the declarative Dedup.simhashChunksFromHashes MODULO the
  * per-bit sign hash (xxhash64(k, h) there, splitmix-style remix here):
  * both are valid SimHash families; near-duplicate behavior (hamming
  * locality) is identical and property-tested in DedupSpec. The declarative
  * form pays 64 interpreted xxhash64 calls per token; this is one compiled
  * loop.
  */
case class SimHashChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_chunks expects array<bigint> token hashes, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_chunks"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // splitmix64 remix of the token hash → 64 independent-ish sign bits
      var z = arr.getLong(i) + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      var k = 0
      while (k < 64) {
        if (((z >>> k) & 1L) == 1L) sums(k) += 1 else sums(k) -= 1
        k += 1
      }
      i += 1
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cIn => {
      val sums = ctx.freshName("sums"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val z = ctx.freshName("z"); val chunks = ctx.freshName("chunks")
      val c = ctx.freshName("c"); val j = ctx.freshName("j"); val v = ctx.freshName("v")
      s"""
         |int[] $sums = new int[64];
         |int $n = $cIn.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $z = $cIn.getLong($i) + 0x9E3779B97F4A7C15L;
         |  $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |  $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |  $z = $z ^ ($z >>> 31);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ((($z >>> $k) & 1L) == 1L) $sums[$k]++; else $sums[$k]--;
         |  }
         |}
         |long[] $chunks = new long[4];
         |for (int $c = 0; $c < 4; $c++) {
         |  long $v = 0L;
         |  for (int $j = 0; $j < 16; $j++) {
         |    if ($sums[$c * 16 + $j] > 0) $v |= (1L << $j);
         |  }
         |  $chunks[$c] = $v;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($chunks);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
    copy(child = newChild)
}

object SimHashChunks {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHashChunks].getName, "simhash_chunks")
}
