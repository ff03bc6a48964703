package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Compiled per-query greedy MMR selection — the whole k-round loop of
  * [[graft.functions.Similarity.mmrRerank]] as ONE expression over a
  * query's collected candidate list and pairwise-similarity list.
  *
  * The DataFrame formulation runs k−1 driver-scheduled rounds (per round:
  * a max-sim aggregation, an anti-join, an inner join, a rank window, a
  * union, an eager localCheckpoint) whose data per query is bounded by
  * kCand² — the cost is round-trip latency and shuffle floors, not bytes
  * (t44 measured ~4.4 s wall for 3 queries × 20 candidates). Grouping the
  * same inputs per query and running the greedy loop compiled keeps the
  * scale shape (work per group stays O(k·kCand²), groups shuffle once) and
  * removes the per-round jobs entirely.
  *
  * Semantics are EXACTLY the loop's, integer math end-to-end:
  *  - step 1 picks max (7·rel_u), tie → smallest doc_id;
  *  - step i picks, among unselected candidates having at least one
  *    recorded sim with a selected doc (the loop's inner join keeps only
  *    those), max (7·rel_u − 3·max sim_u over selected), tie → smallest
  *    doc_id;
  *  - stops early when no candidate is eligible.
  * Both input lists may arrive in any order (collect_list is unordered);
  * every pick is an argmax over a set, so the result is order-invariant.
  *
  * Inputs: cands array<struct<doc_id long, rel_u long>>,
  *         sims  array<struct<a long, b long, sim_u long>> (directed pairs),
  *         k     literal int.
  * Output: array<struct<doc_id long, step long, mmr_u long>>.
  */
case class MmrSelect(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def isCandArr(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) => s.length == 2 &&
      s.forall(_.dataType == LongType)
    case _ => false
  }
  private def isSimArr(t: DataType): Boolean = t match {
    case ArrayType(s: StructType, _) => s.length == 3 &&
      s.forall(_.dataType == LongType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (c, s, IntegerType) if isCandArr(c) && isSimArr(s) && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (c, s, t) => TypeCheckResult.TypeCheckFailure(
        s"mmr_select expects (array<struct<long,long>>, array<struct<long,long,long>>, " +
          s"literal int k), got (${c.simpleString}, ${s.simpleString}, ${t.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("step", LongType, nullable = false),
    StructField("mmr_u", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "mmr_select"

  override protected def nullSafeEval(candsAny: Any, simsAny: Any, kAny: Any): Any = {
    val cands = candsAny.asInstanceOf[ArrayData]
    val sims = simsAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val n = cands.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](n)
    val rel = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 2)
      ids(i) = row.getLong(0); rel(i) = row.getLong(1)
      i += 1
    }
    val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    i = 0
    while (i < n) { idx.put(ids(i), i); i += 1 }
    // sim matrix, Long.MinValue = no recorded pair (ineligibility marker)
    val sim = Array.fill(n * n)(Long.MinValue)
    val m = sims.numElements()
    i = 0
    while (i < m) {
      val row = sims.getStruct(i, 3)
      val ia = idx.get(row.getLong(0)); val ib = idx.get(row.getLong(1))
      if (ia != null && ib != null) {
        val v = row.getLong(2)
        val p = ia * n + ib
        if (v > sim(p)) sim(p) = v // defensive: duplicates take the max
      }
      i += 1
    }
    val selected = new Array[Boolean](n)
    // k <= 0 still emits the step-1 pick: the reference loop
    // (Similarity.mmrRerankLoop) unconditionally selects step 1 and only
    // iterates steps 2..k, so sizing by k alone would both crash (write to
    // a 0-length array) and diverge from the pinned equality semantics.
    val outDoc = new Array[Long](math.min(math.max(k, 1), n))
    val outStep = new Array[Long](outDoc.length)
    val outMmr = new Array[Long](outDoc.length)
    var picked = 0
    // step 1: max 7·rel, tie smallest doc_id
    var best = -1
    i = 0
    while (i < n) {
      if (best < 0 || rel(i) > rel(best) ||
        (rel(i) == rel(best) && ids(i) < ids(best))) best = i
      i += 1
    }
    selected(best) = true
    outDoc(0) = ids(best); outStep(0) = 1L; outMmr(0) = 7L * rel(best)
    picked = 1
    var step = 2
    var exhausted = false
    while (step <= k && picked < n && !exhausted) {
      best = -1
      var bestMmr = 0L
      i = 0
      while (i < n) {
        if (!selected(i)) {
          // max sim over selected docs; candidates with NO recorded pair to
          // any selected doc are ineligible this round (the loop's inner join)
          var ms = Long.MinValue
          var j = 0
          while (j < n) {
            if (selected(j) && sim(i * n + j) > ms) ms = sim(i * n + j)
            j += 1
          }
          if (ms != Long.MinValue) {
            val mmr = 7L * rel(i) - 3L * ms
            if (best < 0 || mmr > bestMmr ||
              (mmr == bestMmr && ids(i) < ids(best))) { best = i; bestMmr = mmr }
          }
        }
        i += 1
      }
      if (best < 0) exhausted = true
      else {
        selected(best) = true
        outDoc(picked) = ids(best); outStep(picked) = step.toLong
        outMmr(picked) = bestMmr
        picked += 1
        step += 1
      }
    }
    val rows = new Array[Any](picked)
    i = 0
    while (i < picked) {
      rows(i) = InternalRow(outDoc(i), outStep(i), outMmr(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Row kernel for generated code (the same method interpreted eval runs). */
  def compute(c: AnyRef, s: AnyRef, k: Int): ArrayData =
    nullSafeEval(c, s, k).asInstanceOf[ArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s, kk) => {
      val ref = ctx.addReferenceObj("mmrSelect", this, classOf[MmrSelect].getName)
      s"${ev.value} = $ref.compute($c, $s, $kk);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MmrSelect =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MmrSelect {
  val info: ExpressionInfo = new ExpressionInfo(classOf[MmrSelect].getName, "mmr_select")
}
