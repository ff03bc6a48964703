package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ENGINE-PORTABLE MinHash signature: k mins over word-3-shingles hashed
  * with an md5-derived family, so any SQL engine reproduces the signature
  * bit-for-bit:
  *
  *   component i = min over shingles s of
  *     int32( first 4 bytes of md5( s || "#" || i ) )   (unsigned, hex order)
  *
  * which is exactly DuckDB's
  *   `('0x' || substr(md5(s || '#' || i), 1, 8))::BIGINT`.
  *
  * Shingles are the d6 construction: lowercase, split on whitespace, join
  * 3 consecutive words with single spaces; texts under 3 words hash the
  * whole text as one shingle. Distinctness is irrelevant under min.
  *
  * The xxhash-family [[MinHashSignature]] stays the production path (one
  * mixed hash per shingle instead of k md5 digests); this expression exists
  * so the FULL MinHash+LSH pipeline can be hash-checked against a DuckDB
  * oracle (entry d8) — the same portability trick t5/t6/t7 use, applied to
  * sketching. Still one compiled eval per row: k·|shingles| digest calls
  * of a few hundred ns each.
  */
case class MinHashMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 expects (string, literal int k), got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_md5"

  override protected def nullSafeEval(textAny: Any, kAny: Any): Any = {
    val k = kAny.asInstanceOf[Int]
    val text = textAny.asInstanceOf[UTF8String].toLowerCase.toString
    val words = text.split("\\s+").filter(_.nonEmpty)
    // DISTINCT shingles before hashing — min over a multiset equals min
    // over its set, and k md5 digests per repeated window were the row's
    // dominant cost on boilerplate-heavy docs (same digests, fewer calls)
    val shingles = new java.util.LinkedHashSet[String]()
    if (words.length >= 3) {
      var i = 0
      while (i <= words.length - 3) {
        shingles.add(s"${words(i)} ${words(i + 1)} ${words(i + 2)}"): Unit
        i += 1
      }
    } else shingles.add(words.mkString(" ")): Unit
    val md = java.security.MessageDigest.getInstance("MD5")
    val suffixes = MinHashMd5.suffixBytes(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val sb = it.next().getBytes("UTF-8")
      var i = 0
      while (i < k) {
        md.reset()
        md.update(sb)
        md.update(suffixes(i))
        val d = md.digest()
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Row kernel for generated code (the same method interpreted eval runs). */
  def compute(text: AnyRef, k: Int): ArrayData =
    nullSafeEval(text, k).asInstanceOf[ArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, kk) => {
      val ref = ctx.addReferenceObj("minhashMd5", this, classOf[MinHashMd5].getName)
      s"${ev.value} = $ref.compute($t, $kk);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashMd5 =
    copy(left = newLeft, right = newRight)
}

object MinHashMd5 {
  val info: ExpressionInfo = new ExpressionInfo(classOf[MinHashMd5].getName, "minhash_md5")

  /** Cached `"#i"` suffix bytes per family width — previously re-built
    * (string format + encode) once per shingle per component. */
  private val suffixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private[expr] def suffixBytes(k: Int): Array[Array[Byte]] =
    suffixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(i => s"#$i".getBytes("UTF-8")))
}
