package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Windowed funnel (CEP MATCH_RECOGNIZE analog) — hand-computed chains,
  * the strictly-earlier tie rule, the window bound, and the
  * greedy-latest-predecessor correctness case (an early step-1 outside the
  * window must not mask a later one inside it). */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600000L // one hour in ms
  private val W = 24 * H

  private def run(rows: Seq[(Long, String, Long)]): Map[Long, (Long, Long, Long, Long)] = {
    import spark.implicits._
    val ev = rows.toDF("user_id", "event_type", "ts_ms")
    RelationalOps.funnelOver(ev, Seq("view", "click", "purchase"), W)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("complete chain, wrong-order chain, and earliest-completion pick") {
    val out = run(Seq(
      // user 1: view → click → purchase, two completions — earliest wins
      (1L, "view", 0L), (1L, "click", 1 * H), (1L, "purchase", 2 * H),
      (1L, "purchase", 3 * H),
      // user 2: click precedes any view — never a qualified click
      (2L, "click", 0L), (2L, "view", 1 * H), (2L, "purchase", 2 * H)))
    assert(out(1L) === ((1L, 1L, 2L, 2 * H)))
    assert(out(2L) === ((1L, 0L, 0L, -1L)))
  }

  test("same-timestamp step is NOT strictly earlier (tie rule)") {
    val out = run(Seq(
      (3L, "view", 5 * H), (3L, "click", 5 * H), (3L, "purchase", 6 * H)))
    assert(out(3L) === ((1L, 0L, 0L, -1L)))
  }

  test("window bound: a step outside 24h does not chain") {
    val out = run(Seq(
      (4L, "view", 0L), (4L, "click", 25 * H), (4L, "purchase", 26 * H)))
    assert(out(4L) === ((1L, 0L, 0L, -1L)))
  }

  test("latest predecessor decides: early out-of-window view, later in-window one") {
    val out = run(Seq(
      (5L, "view", 0L), (5L, "view", 10 * H),
      (5L, "click", 30 * H), // 20h after the SECOND view — qualifies
      (5L, "purchase", 40 * H))) // 10h after the qualified click
    assert(out(5L) === ((2L, 1L, 1L, 40 * H)))
  }

  test("k-step generalization: a 4-step funnel chains and still one-shots") {
    import spark.implicits._
    val ev = Seq(
      (6L, "a", 0L), (6L, "b", 1 * H), (6L, "c", 2 * H), (6L, "d", 3 * H),
      (7L, "a", 0L), (7L, "b", 1 * H), (7L, "d", 2 * H)) // no step c
      .toDF("user_id", "event_type", "ts_ms")
    val out = RelationalOps.funnelOver(ev, Seq("a", "b", "c", "d"), W)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(6L) === ((1L, 1L, 1L, 1L, 3 * H)))
    assert(out(7L) === ((1L, 1L, 0L, 0L, -1L)))
    val p = RelationalOps.funnelOver(ev, Seq("a", "b", "c", "d"), W)
      .queryExecution.executedPlan.toString()
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1, p)
  }

  test("model check: random streams equal an independent exists-in-window reference") {
    import spark.implicits._
    val types = Vector("view", "click", "purchase", "other")
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(4000 + trial)
      val win = (rnd.nextInt(20) + 2) * H
      // coarse timestamps on purpose: ms ties are frequent, so the
      // strictly-earlier rule is exercised constantly
      val rows = Seq.fill(150)((rnd.nextInt(5) + 1L,
        types(rnd.nextInt(types.size)), (rnd.nextInt(40) + 1).toLong * H))
      // reference: row-wise EXISTS-in-[ms−W, ms) over qualifying-time SETS —
      // a different formulation than the operator's chained running maxima
      def ref(evs: Seq[(String, Long)]): (Long, Long, Long, Long) = {
        val q0 = evs.collect { case ("view", ms) => ms }.toSet
        def quals(prev: Set[Long], step: String) = evs.collect {
          case (`step`, ms) if prev.exists(t => t >= ms - win && t < ms) => ms
        }
        val q1 = quals(q0, "click")
        val q2 = quals(q1.toSet, "purchase")
        (evs.count(_._1 == "view").toLong, q1.size.toLong, q2.size.toLong,
          if (q2.isEmpty) -1L else q2.min)
      }
      val expect = rows.groupBy(_._1).map { case (u, rs) =>
        u -> ref(rs.map(r => (r._2, r._3)))
      }
      val got = RelationalOps.funnelOver(rows.toDF("user_id", "event_type", "ts_ms"),
          Seq("view", "click", "purchase"), win)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == expect, s"trial=$trial win=${win / H}h")
    }
  }

  test("one exchange total: the final agg reuses the window partitioning") {
    val df = RelationalOps.funnel(spark, TestSpark.sfDir)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }
}
