package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The physical plans we WANT, asserted (SURVEY §4 + builder brief:
  * "iterate until it's the plan you'd want"). These are the properties
  * that decide whether the same code survives a 100 TB scale-up:
  * predicate pushdown to parquet, column pruning at the scan, broadcast
  * of the small dim in the 3-way join, partial aggregation, and top-k
  * without a global sort. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def exchanges(p: String): Int =
    p.sliding("Exchange".length).count(_ == "Exchange")

  test("R4 filter pushes to the parquet scan (PushedFilters)") {
    val p = plan(RelationalOps.filterEq(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"), p)
  }

  test("R6 projection prunes the scan to the 2 referenced columns") {
    val p = plan(RelationalOps.projectAlias(spark, dir))
    assert(p.contains("ReadSchema: struct<c_name:string,c_acctbal:double>"), p)
  }

  test("R8 triple join broadcasts the customer dim; no cartesian anywhere") {
    val p = plan(RelationalOps.tripleJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("R9 aggregate is partial+final (map-side combine before the shuffle)") {
    val p = plan(RelationalOps.aggCount(spark, dir))
    assert(p.contains("partial_count"), p)
  }

  test("R11 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan(RelationalOps.topK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("R10 having-subquery pushes nothing extra but keeps agg partial") {
    val p = plan(RelationalOps.havingSubquery(spark, dir))
    assert(p.contains("partial_count"), p)
    // cnt > 10 runs post-agg (derived column) — must NOT reach the scan
    assert(!p.contains("PushedFilters: [IsNotNull(cnt)"), p)
  }

  test("t2 text stats is a map-only scan (no shuffle at all)") {
    val df = graft.functions.TextAnalysis.textStats(graft.Tables.documents(spark, dir))
    assert(!plan(df).contains("Exchange"), plan(df))
  }

  test("t5 hash sample is a pushed-down filter scan — no shuffle, no window") {
    val p = plan(graft.functions.LlmQueries.hashSample(spark, dir))
    assert(!p.contains("Exchange") && !p.contains("Window"), p)
  }

  test("r20 semi / r21 anti plan as semi-family joins, nothing materialized") {
    val semi = plan(RelationalOps.semiJoin(spark, dir))
    assert(semi.contains("LeftSemi"), semi)
    val anti = plan(RelationalOps.antiJoin(spark, dir))
    assert(anti.contains("LeftAnti"), anti)
  }

  test("r25 percentile aggregate is partial+final (mergeable sketch shape)") {
    val p = plan(RelationalOps.percentiles(spark, dir))
    assert(p.contains("partial_percentile"), p)
  }

  test("IVF assign is a projection: no row blow-up join, only the top-k window") {
    val emb = graft.Tables.embeddings(spark, dir)
    val p = plan(graft.functions.Similarity.ivfTopK(emb, emb.limit(5)))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // exactly one Window node remains: the final per-query top-k
    // ("Window [" won't match the WindowGroupLimit nodes that top-k adds)
    assert("Window \\[".r.findAllIn(p).size == 1, p)
  }

  test("IVF near-dup mining has no window and no nested-loop join at all") {
    val emb = graft.Tables.embeddings(spark, dir)
    val p = plan(graft.functions.Similarity.embeddingNearDupIvf(emb))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("sequence packing windows per bucket — never a single-partition global window") {
    val p = plan(graft.functions.LlmQueries.sequencePack(spark, dir))
    assert(!p.contains("SinglePartition"), p)
  }

  test("label centroids aggregate partial+final (no row blow-up through the exchange)") {
    val p = plan(graft.functions.LlmQueries.labelCentroids(spark, dir))
    assert(p.contains("partial_avg"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("portable ANN twins keep the production plan shapes (no nested-loop joins)") {
    val emb = graft.Tables.embeddings(spark, dir)
    // s18: assign is a projection, candidates an equi-join on cell_id
    val ivf = plan(graft.functions.Similarity.ivfTopKFixed(emb, emb.limit(5)))
    assert(!ivf.contains("BroadcastNestedLoopJoin") && !ivf.contains("CartesianProduct"), ivf)
    assert("Window \\[".r.findAllIn(ivf).size == 1, ivf)
    // s20: candidates an equi-join on (table, bucket)
    val lsh = plan(graft.functions.Similarity.lshTopKPortable(emb, emb.limit(5)))
    assert(!lsh.contains("BroadcastNestedLoopJoin") && !lsh.contains("CartesianProduct"), lsh)
  }

  test("s33 PQ-ADC search: broadcast LUTs over one codes scan, native encode") {
    val p = plan(graft.functions.LlmQueries.pqAdcAnn(spark, dir))
    assert(p.contains("pq_encode"), p)
    assert(p.contains("Broadcast"), s"query LUTs must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("r18 rollup expands grouping sets with partial aggregation") {
    val p = plan(RelationalOps.rollupAgg(spark, dir))
    assert(p.contains("Expand"), p)
    assert(p.contains("partial_count"), p)
  }

  test("t11 decontamination broadcasts the benchmark shingles; agg is partial") {
    val p = plan(graft.functions.LlmQueries.decontaminate(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark shingle set must be the broadcast side:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
    // the production path shingles with the native kernel — no interpreted
    // transform/array_distinct chain (the string twin keeps that form)
    assert(p.contains("shingle_hashes64"), p)
    assert(!p.contains("array_distinct"), p)
  }

  test("t12 PII redaction is a map-only scan (no shuffle)") {
    val p = plan(graft.functions.LlmQueries.piiRedact(spark, dir))
    assert(!p.contains("Exchange"), p)
  }

  test("t15 mixture sample is a pure filter scan — no shuffle, no window") {
    val p = plan(graft.functions.LlmQueries.mixtureSample(spark, dir))
    assert(!p.contains("Exchange") && !p.contains("Window"), p)
  }

  test("t16 BM25 broadcasts the query terms; no re-tokenize in the final plan") {
    val p = plan(graft.functions.LlmQueries.bm25TopK(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"query-term set must be the broadcast side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the corpus postings list is tokenized once in the localCheckpoint
    // job; the scoring plan reads pinned blocks (queries still explode —
    // one Generate over 3 rows is fine, corpus-sized re-tokenize is not),
    // so the only Generates allowed are on the broadcast (query) side
    assert(p.contains("partial_sum"), p)
  }

  test("d15 HLL registers: partial+final object aggregate (sketch merge map-side)") {
    val p = plan(graft.functions.LlmQueries.hllRegisters(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"typed-imperative agg expected:\n$p")
    assert(p.contains("partial_hll_agg"), s"map-side sketch combine expected:\n$p")
  }

  test("d17 CMS registers: partial+final object aggregate (sketch sum map-side)") {
    val p = plan(graft.functions.LlmQueries.cmsRegisters(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"typed-imperative agg expected:\n$p")
    assert(p.contains("partial_cms_agg"), s"map-side sketch combine expected:\n$p")
  }

  test("t17 mixture epochs is map-side row generation — no shuffle, no window") {
    val p = plan(graft.functions.LlmQueries.mixtureEpochs(spark, dir))
    assert(!p.contains("Exchange") && !p.contains("Window"), p)
    assert(p.contains("Generate"), s"explode over the epoch sequence expected:\n$p")
  }

  test("r32 explicit-values pivot is one aggregation pass — exactly one exchange") {
    val p = plan(RelationalOps.pivotEventCounts(spark, dir))
    assert(p.contains("partial_pivotfirst") || p.contains("partial_count"),
      s"map-side partial aggregation expected:\n$p")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"explicit pivot values must not add a distinct-discovery shuffle:\n$p")
  }

  test("d20 heavy hitters: CMS object agg guards the exact re-count; no nested-loop joins") {
    val p = plan(graft.functions.LlmQueries.heavyHitters(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"CMS sketch agg expected:\n$p")
    assert(p.contains("partial_count"), s"exact re-count partial agg expected:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("t13 unigram scoring: vocabulary-sized shuffles only, partial aggs") {
    val p = plan(graft.functions.LlmQueries.unigramLogProb(spark, dir))
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // tokenization runs ONCE (in the localCheckpoint job); every consumer
    // in the final plan reads the pinned token blocks, so no explode /
    // Generate survives here
    assert(!p.contains("Generate"), s"final plan must not re-tokenize:\n$p")
  }

  test("r37 fact scan carries a runtime dynamicpruning partition filter") {
    val p = plan(RelationalOps.dppJoin(spark, dir))
    assert(p.contains("dynamicpruning"),
      s"dim filter must prune fact partitions at runtime:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("r38 decayed score: broadcast horizon join, partial aggs, no window") {
    val p = plan(RelationalOps.decayedScore(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"per-user horizon must broadcast back:\n$p")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("WindowExec"), s"no per-user window sort expected:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the horizon is materialized once and reused (guard count + join)
    assert(p.contains("Scan ExistingRDD"), s"horizon must be checkpointed:\n$p")
  }

  test("r38 decayed score scale guard: above the row threshold the broadcast hint drops") {
    // force the guard: same results, no forced broadcast in the plan the
    // operator builds (AQE may still choose broadcast at runtime — the
    // guard's job is only to stop the unconditional driver-side collect)
    val guarded = RelationalOps.decayedScore(spark, dir, maxBroadcastRows = 0L)
    val default = RelationalOps.decayedScore(spark, dir)
    assert(guarded.exceptAll(default).isEmpty && default.exceptAll(guarded).isEmpty,
      "guarded path must be result-identical")
  }

  test("t21 bigram scoring: pinned token arrays, no window/self-join over the corpus") {
    val p = plan(graft.functions.TextAnalysis.bigramLogProb(
      graft.Tables.documents(spark, dir)))
    assert(p.contains("partial_count"), p)
    // bigram construction is map-side zip/slice over the CHECKPOINTED
    // arrays — no per-doc Window sort and no corpus self-join
    assert(!p.contains("WindowExec") && !p.contains("Window "), s"no window expected:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Scan ExistingRDD"), s"must read the pinned tokenize pass:\n$p")
  }

  test("r42/r43 sequence analytics: joinless, Expand-free, bounded exchanges") {
    // streaks: distinct shuffles (user, day); the island window, island
    // groupBy, and per-user pick all reuse the user partitioning
    val p1 = plan(RelationalOps.activityStreaks(spark, dir))
    assert(exchanges(p1) == 2, s"streaks must shuffle exactly twice:\n$p1")
    assert(!p1.contains("Join") && !p1.contains("Expand"), p1)
    // retention: distinct + one window; the cohort agg reuses partitioning;
    // no firsts-table self-join, no count_distinct Expand
    val p2 = plan(RelationalOps.retentionCohorts(spark, dir))
    assert(!p2.contains("Join") && !p2.contains("Expand"), p2)
  }

  test("r48 unpivot plans ONE map-side Expand feeding a partial agg") {
    val p = plan(RelationalOps.unpivotMeasures(spark, dir))
    assert(p.contains("Expand"), s"unpivot must be an Expand:\n$p")
    assert(p.contains("partial_sum"), p)
    assert(exchanges(p) == 1, s"one exchange (the final agg):\n$p")
    assert(!p.contains("Union"), s"never k per-measure rescans:\n$p")
  }

  test("r50 window distribution: one window (one exchange) serves all three functions") {
    val p = plan(RelationalOps.windowDistribution(spark, dir))
    assert(exchanges(p) == 1, s"ntile/percent_rank/cume_dist share one window:\n$p")
    assert("(?s)Window.*Window".r.findFirstIn(p).isEmpty,
      s"must plan a single Window operator:\n$p")
  }

  test("TPC-H shapes: q1/q6 push scan filters and pre-aggregate; q3 broadcasts only the dim") {
    // (PushedFilters renders truncated in toString — assert the scan
    // carries a PushedFilters list headed by the date column, plus the
    // full predicates from the untruncated Filter node)
    val p1 = plan(RelationalOps.tpchQ1(spark, dir))
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipda"),
      s"q1 date filter must reach the scan:\n$p1")
    assert(p1.contains("partial_sum") && exchanges(p1) == 1, p1)
    val p6 = plan(RelationalOps.tpchQ6(spark, dir))
    assert(p6.contains("PushedFilters: [IsNotNull(l_shipdate)") &&
      p6.contains(">= 0.05)") && p6.contains("<= 0.07)") &&
      p6.contains("< 24.0)"),
      s"q6 range predicates must push:\n$p6")
    assert(p6.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"),
      s"q6 must prune to the 4 referenced columns:\n$p6")
    val p3 = plan(RelationalOps.tpchQ3(spark, dir))
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(p3.contains("TakeOrderedAndProject"), s"q3 top-10 must TakeOrdered:\n$p3")
    assert(!p3.contains("CartesianProduct"), p3)
  }

  test("t22 DSIR weights: one pinned tokenize+hash pass, broadcast stats join") {
    val p = plan(graft.functions.TextAnalysis.dsirWeights(
      graft.Tables.documents(spark, dir),
      org.apache.spark.sql.functions.col("lang") === "en"))
    // the bucket-sized stats table comes back as a broadcast, never a
    // shuffled join against the exploded corpus
    assert(p.contains("BroadcastHashJoin"), s"stats join must broadcast:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    assert(!p.contains("Generate"), s"final plan must not re-tokenize:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
