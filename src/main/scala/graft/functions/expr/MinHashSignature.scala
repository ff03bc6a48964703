package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: array<long> shingle base-hashes → array<long>
  * signature, h_i(s) = (a_i * h0 + b_i) mod 2^31-1, min per component.
  *
  * Same family and constants as graft.functions.Dedup.minhashSignature
  * (the declarative zip_with fold), but Spark's higher-order functions are
  * interpreted (no codegen, boxed lambdas) — at sf0.1 the signature pass
  * dominated MinHash-LSH wall time. This expression emits one primitive
  * nested loop inside WholeStageCodegen: numHashes × |shingles| mult/mod,
  * no allocation beyond the output array.
  */
case class MinHashSignature(child: Expression, numHashes: Int = 64)
    extends UnaryExpression {

  import MinHashSignature.P

  private lazy val (aConst, bConst) = MinHashSignature.constants(numHashes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint> shingle hashes, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      var h0 = arr.getLong(i) % P; if (h0 < 0) h0 += P
      var j = 0
      while (j < numHashes) {
        val v = (aConst(j) * h0 + bConst(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aConst, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bConst, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h0 = ctx.freshName("h0"); val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h0 = $c.getLong($i) % ${P}L; if ($h0 < 0) $h0 += ${P}L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($aRef[$j] * $h0 + $bRef[$j]) % ${P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val P = 2147483647L // 2^31 - 1

  /** The (a_i, b_i) family — MUST stay identical to the declarative
    * Dedup.minhashSignature constants (seeded PRNG, seed 42). */
  def constants(numHashes: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = new Array[Long](numHashes); val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = (rnd.nextLong() & Long.MaxValue) % (P - 2) + 1
      b(i) = (rnd.nextLong() & Long.MaxValue) % P
      i += 1
    }
    (a, b)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, "minhash_sig")
}
