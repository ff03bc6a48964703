package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The reference's batch relational surface (SURVEY.md §2.2 R1, R4–R12),
  * re-expressed on the driver testdata star schema (FIXTURES.md §2 mapping:
  * customer↔person, orders↔sporting_event_ticket, lineitem↔ticket_purchase_hist,
  * events↔CDC changelog).
  *
  * Everything here is declarative DataFrame API — Catalyst handles pushdown,
  * pruning, join strategy (broadcast for the small dim side), and partial
  * aggregation. No RDDs, no UDFs, no collect().
  */
object RelationalOps {

  /** Epoch millis from a parquet TIMESTAMP_NTZ column. The session timezone
    * is UTC everywhere in this engine, so the NTZ→LTZ cast is instant-exact
    * and matches DuckDB's epoch_ms over the same file. */
  private def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** R1 — full snapshot scan (zpln:463 `select * from t1`). */
  def fullScan(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)

  /** R4 — equality filter on key (zpln:665 `where uuid = 'id1'`).
    * Predicate reaches the parquet scan as PushedFilters: [EqualTo(c_custkey,42)]. */
  def filterEq(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).filter(col("c_custkey") === 42L)

  /** R6 — projection + aliasing (zpln:2161). Column pruning: scan reads 2 cols. */
  def projectAlias(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_name").as("full_name"), col("c_acctbal").as("balance"))

  /** R7 — CAST scalar function (zpln:2161 `cast(… as string)`). */
  def castCols(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast("string").as("id"),
        epochMs(col("o_orderdate")).as("od_ms"),
        // double→string goes via DECIMAL(18,2): both Spark and the DuckDB
        // oracle render the decimal identically; raw double→string differs
        // (Java Double.toString vs DuckDB's shortest-roundtrip format).
        col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_str"))

  /** R8 — 3-way inner equi-join (zpln:2161/2317):
    * person ⋈ ticket ⋈ hist ≡ customer ⋈ orders ⋈ lineitem.
    * customer is the small dim — Catalyst broadcasts it (AQE confirms);
    * orders ⋈ lineitem shuffles on the shared orderkey. */
  def tripleJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .select(
        col("c_name").as("full_name"),
        col("l_orderkey").cast("string").as("id"),
        col("l_extendedprice").as("price"),
        epochMs(col("l_shipdate")).as("ts_ms"))
  }

  /** R9 — GROUP BY + COUNT(*) hash aggregate (zpln:2757). */
  def aggCount(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))

  /** R5 + R10 — derived-table subquery re-filtered on the aggregate
    * (zpln:2757 `select … from (…group by…) where cnt > 1`). */
  def havingSubquery(spark: SparkSession, dir: String): DataFrame =
    aggCount(spark, dir).filter(col("cnt") > 10)

  /** R11 — Sort + Limit top-k (zpln:895 `order by id desc limit 2`).
    * Catalyst plans TakeOrderedAndProject — per-partition top-k, no full sort. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** R12 — keyed dedup, last-write-wins (the Hudi PK-upsert semantics,
    * zpln:2119/:2234): latest event per user_id, ordered by (ts, event_id). */
  def dedupLastWriteWins(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_ms"))
  }

  /** The R9→R10 duplicate-check invariant over an upserted view
    * (zpln:2757, must be empty per :2812). Exposed as a reusable check. */
  def duplicateCheck(view: DataFrame, keyCol: String): DataFrame =
    view.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)

  /** JSON field extraction over the events props column (engine utility;
    * the reference's workload carries JSON-ish payloads through Lambda). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_val"))

  /** Sessionization: split each user's events into sessions at >30-minute
    * gaps (classic gaps-and-islands; the batch twin of a session window).
    * One window-function pass, no self-join — partition-local after the
    * single shuffle on user_id. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
  }

  /** Tumbling-window aggregate over event time — the batch form of the
    * streaming windowed agg (see graft.streaming). 1-hour tumble. */
  def tumbleAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 3).as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** ROLLUP aggregate: per-(status, priority) totals, per-status subtotals,
    * grand total in one pass (Spark expands the grouping sets and keeps the
    * aggregation partial/map-side). Money is summed as exact bigint cents —
    * double-sum ordering differs between engines, integer sums don't. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      // subtotal rows surface as NULL group keys; expose a sentinel instead
      // (row-sort compare harnesses don't order NULLs portably)
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("cnt"), col("sum_cents"))

  /** CUBE aggregate — all 2^2 grouping sets of (status, priority) in one
    * pass (same Expand + partial-agg shape as rollup, one more set). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("cnt"), col("sum_cents"))

  /** Explicit GROUPING SETS — a set list neither rollup nor cube can
    * spell ((status, priority), (status), (priority): cube minus the
    * grand total), one Expand + partial-agg pass like its siblings.
    * Sentinels replace the subtotal NULLs (portable row-sort compare);
    * the source columns are non-null, so sentinel rows stay distinct. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("cnt"), col("sum_cents"))

  /** Window-analytics bundle over events: per-user value rank, previous
    * value (lag), and a running exact-micros sum — one shuffle on user_id
    * shared by all three window frames. lag's leading NULL is coalesced to
    * -1: the compare harness sorts rows and NULLs don't order portably. */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val byTime = byUser.orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("value_rank", rank().over(byUser.orderBy(col("value").desc)))
      .withColumn("prev_value", coalesce(lag(col("value"), 1).over(byTime), lit(-1.0)))
      .withColumn("running_micros",
        sum(round(col("value") * 1000000).cast("long"))
          .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts_ms"),
        col("value"), col("value_rank"), col("prev_value"), col("running_micros"))
  }

  /** As-of join on the events stream: each purchase picks up the user's
    * latest click at-or-before it (see [[AsOfJoin]] — merge-scan, one
    * shuffle, no inequality-join blow-up). Ordering runs on the full
    * nanosecond timestamps; the output exposes oracle-stable epoch-ms. */
  def asofPurchaseClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts_ns").as("p_ns"), col("ts_ms").as("p_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_event_id"),
        col("ts_ns").as("c_ns"), col("ts_ms").as("c_ms"))
    AsOfJoin.asOf(p, c, "user_id", "c_user", "p_ns", "c_ns",
        rightTieBreak = Seq("c_ns", "c_event_id"))
      .select("user_id", "p_event_id", "p_ms", "c_event_id", "c_ms")
  }

  /** FORWARD as-of join (gate entry r58 — r16's symmetric direction, the
    * pandas merge_asof direction='forward' analog): for every purchase,
    * the FIRST click at-or-after it — "what did the user do next" instead
    * of "what led here". Same merge-scan shape (one shuffle + per-key
    * sort of |L|+|R|, no pair blow-up), reversed scan order; tied clicks
    * resolve to the min (ts, event_id). */
  def asofForwardClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts_ns").as("p_ns"), col("ts_ms").as("p_ms"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_event_id"),
        col("ts_ns").as("c_ns"), col("ts_ms").as("c_ms"))
    AsOfJoin.asOf(p, c, "user_id", "c_user", "p_ns", "c_ns",
        rightTieBreak = Seq("c_ns", "c_event_id"), direction = "forward")
      .select("user_id", "p_event_id", "p_ms", "c_event_id", "c_ms")
  }

  /** Exact interpolated percentiles (p50/p90) per group — Spark
    * `percentile` and DuckDB `quantile_cont` share the linear-interpolation
    * definition, so this is hash-checkable. The approximate scale path is
    * `approx_percentile` (t-digest, one pass, mergeable) — same call shape,
    * not oracle-comparable by construction. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
        count(lit(1)).as("cnt"))

  /** Range join on the events stream: for each error event, how many
    * clicks (any user) landed within ±60 s — binned interval join (see
    * [[RangeJoin]]), never a cartesian. */
  def rangeJoinErrClicks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts_ms").as("err_ms"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("clk_id"), col("ts_ms").as("clk_ms"))
    RangeJoin.intervalJoin(err, clk, "err_ms", "clk_ms", width = 60000L)
      .groupBy(col("err_id")).agg(count(lit(1)).as("n_clicks"))
  }

  /** Scalar subquery: orders above the median price. The threshold joins
    * in as a broadcast single-row aggregate — the subquery evaluates once,
    * the filter stays distributed. Median (exact interpolation) rather
    * than avg: float summation order differs between engines, interpolated
    * order statistics don't. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val med = o.agg(expr("percentile(o_totalprice, 0.5)").as("__med"))
    o.join(broadcast(med))
      .filter(col("o_totalprice") > col("__med"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** LEFT SEMI join — customers that placed at least one order. Catalyst
    * plans the EXISTS shape as a semi join: the probe side streams, the
    * build side holds only keys, nothing from orders is materialized. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
  }

  /** LEFT ANTI join — customers that never produced an event (NOT EXISTS).
    * (Against events, not orders: every customer has orders in this data,
    * and a 0-row check checks nothing.) */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"))
    Tables.customer(spark, dir)
      .join(e, col("c_custkey") === col("user_id"), "left_anti")
  }

  /** LEFT OUTER join against a pre-aggregated side: order count per
    * customer INCLUDING zero-order customers. Aggregate-then-join keeps the
    * shuffled payload one row per key, not one per order. */
  def outerJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cnts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("__cnt"))
    Tables.customer(spark, dir)
      .join(cnts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("__cnt"), lit(0L)).as("order_cnt"))
  }

  /** INTERSECT — event users that are also customer keys (distinct). */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("user_id"))
      .intersect(Tables.customer(spark, dir).select(col("c_custkey").as("user_id")))

  /** EXCEPT — customer keys that never produced an event (distinct). */
  def exceptKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey"))
      .except(Tables.events(spark, dir).select(col("user_id").as("c_custkey")))

  /** PIVOT — per-user event counts widened to one column per event type,
    * planned as conditional aggregation (count of a CASE per value): ONE
    * partial+final aggregation, ONE exchange. Spark's `.pivot()` API would
    * plan two chained aggregations (count by (key, value), then pivotfirst
    * by key — two shuffles), and an implicit pivot adds a corpus-wide
    * DISTINCT job to discover columns; with a known value list, the CASE
    * form is strictly the better 100 TB plan. */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val aggs = Seq("click", "error", "purchase", "signup", "view")
      .map(t => count(when(col("event_type") === t, 1)).as(t))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** DYNAMIC PARTITION PRUNING over a partition-laid-out fact (the layout
    * every 100 TB fact table ships: date/category directory partitions):
    * the fact is written `partitionBy(event_type)`, the dim filter
    * (`kind = 'web'`) is only known at runtime after the dim scan — and
    * Spark's DPP turns the broadcast dim into a runtime partition filter
    * on the fact scan, so non-web partitions are never LISTED, let alone
    * read. At 100 TB the difference between scanning 3/5 of the table and
    * 5/5 is the whole query budget. Plan shape (dynamicpruning expression
    * in PartitionFilters) asserted in PlanSpec. */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val factDir = graft.TempDirs.create("dpp-fact")
    Tables.events(spark, dir)
      .select("user_id", "event_id", "value", "ts_ms", "event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(factDir)
    // the dim lives in storage (not a local relation — a folded-away local
    // filter would hide the selective predicate DPP keys on)
    val dimDir = graft.TempDirs.create("dpp-dim")
    Seq(("click", "web"), ("view", "web"), ("signup", "web"),
      ("purchase", "commerce"), ("error", "ops")).toDF("event_type", "kind")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    spark.read.parquet(factDir)
      .join(dim.filter(col("kind") === "web"), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_value"))
  }

  /** Data-quality validation suite (the Deequ/expectations analog a
    * production ingest runs before publishing a snapshot): each check is
    * one integer metric plus its pass verdict — completeness, key
    * uniqueness, value-range conformance, referential integrity. Every
    * metric is a count, so the whole report is hash-exact across engines.
    * Shape: one aggregate per source table (partial+final), the FK check
    * is a broadcast-able anti join — nothing quadratic, nothing floats. */
  def dataChecks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val custAgg = cust.agg(
      count(lit(1)).as("n"),
      count_distinct(col("c_custkey")).as("dk"),
      sum(when(col("c_name").isNull, 1L).otherwise(0L)).as("nulls")).head()
    val ordAgg = ord.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("neg")).head()
    val orphans = li.join(ord.select("o_orderkey"),
      li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
    Seq(
      ("customer", "row_count", custAgg.getAs[Long]("n"), custAgg.getAs[Long]("n") > 0),
      ("customer", "key_unique",
        custAgg.getAs[Long]("n") - custAgg.getAs[Long]("dk"),
        custAgg.getAs[Long]("n") == custAgg.getAs[Long]("dk")),
      ("customer", "name_nulls", custAgg.getAs[Long]("nulls"),
        custAgg.getAs[Long]("nulls") == 0L),
      ("orders", "negative_totalprice", ordAgg.getAs[Long]("neg"),
        ordAgg.getAs[Long]("neg") == 0L),
      ("lineitem", "orphan_orderkeys", orphans, orphans == 0L),
    ).toDF("tbl", "check", "metric", "passed")
  }

  /** Time-decayed engagement score, INTEGER-EXACT (the freshness-weighted
    * feature every ranking/retention model wants, without the float-sum
    * nondeterminism EWMA usually drags in): per user,
    * Σ value_cents · 2^(30 − age_hours) over events at most 30 h older
    * than the user's latest — a half-life of one hour expressed as exact
    * binary weights in the long domain. Every product and the sum are
    * exact integers, so the score is bit-identical across partitionings,
    * retries, and engines (the hash-compare proves it). One groupBy for
    * the per-user horizon (broadcast back), one partial+final agg.
    *
    * Scale guard: the horizon is one row per USER — at gate scale a
    * forced broadcast is the right plan, but at 100× user cardinality it
    * would blow the driver/executor broadcast budget. The horizon is
    * materialized once (localCheckpoint — reused by the guard count and
    * the join) and the hint is dropped above [[MaxBroadcastHorizonRows]],
    * letting AQE plan the join instead. */
  val MaxBroadcastHorizonRows: Long = 2L * 1024 * 1024 // ≈tens of MB of (user, hmax)

  def decayedScore(spark: SparkSession, dir: String,
                   maxBroadcastRows: Long = MaxBroadcastHorizonRows): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("value"), expr("ts_ms div 3600000").as("h"))
    val horizon = ev.groupBy("user_id").agg(max(col("h")).as("hmax"))
      .localCheckpoint(true)
    val joined =
      if (horizon.count() <= maxBroadcastRows) ev.join(broadcast(horizon), Seq("user_id"))
      else ev.join(horizon, Seq("user_id"))
    joined
      .withColumn("age", col("hmax") - col("h"))
      .filter(col("age") <= 30)
      .withColumn("w", expr("cast(pow(2.0, 30 - age) AS BIGINT)"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy("user_id")
      .agg(sum(col("cents") * col("w")).as("score_x2e30"),
        count(lit(1)).as("n_recent"))
  }

  /** Gap-filled hourly time series: per-event-type counts with explicit
    * zero rows for empty hours. The grid is (hour range × type cardinality)
    * — generated from one explode over a sequence, independent of event
    * count — and the corpus touches exactly one aggregation; the grid join
    * is aggregate-sized on both sides. The densification every downstream
    * window/forecast op needs (a rolling average over a sparse series is
    * silently wrong). */
  def gapFillHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val counts = ev.groupBy(col("event_type"),
        expr("ts_ms div 3600000").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val grid = ev.agg(min(expr("ts_ms div 3600000")).as("h0"),
        max(expr("ts_ms div 3600000")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .crossJoin(ev.select(col("event_type")).distinct())
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), (col("h") * 3600000L).as("window_start_ms"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** SLIDING window aggregate (1 h windows every 15 min): each event lands
    * in exactly 4 overlapping windows — Spark expands the assignment
    * map-side (a 4× Generate before the partial agg), so the shuffle moves
    * pre-combined (window, type) partials, not 4× the events. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 3).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Rolling 24 h sum over the GAP-FILLED hourly series — the window is
    * only correct because empty hours exist as explicit zero rows (24 ROWS
    * == 24 hours); exact bigint sums keep it engine-reproducible. Each
    * type's partition is time-range-sized, independent of event count. */
  /** Grouped top-k (latest 3 events per user) written as the standard
    * `row_number() <= k` window query but PLANNED through the
    * [[graft.plans.TopKRewrite]] optimizer rule: one ObjectHashAggregate
    * with a size-k buffer per key, no shuffle-wide sort, one array row
    * per key through the exchange. The ordering (ts_ms DESC, event_id
    * DESC) is total, so the rewritten plan must reproduce the window
    * form — and the DuckDB oracle — bit-for-bit, rank column included.
    * The eager checkpoint forces planning while the conf is on. */
  def topkRewritten(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.graft.topkRewrite", "true")
    try {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms").desc, col("event_id").desc)
      Tables.events(spark, dir)
        .select("user_id", "event_id", "event_type", "value", "ts_ms")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .localCheckpoint(true)
    } finally spark.conf.unset("spark.graft.topkRewrite")
  }

  def rollingCounts(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("window_start_ms"))
      .rowsBetween(-23, 0)
    gapFillHourly(spark, dir)
      .select(col("event_type"), col("window_start_ms"), col("cnt"),
        sum(col("cnt")).over(w).as("rolling_24h"))
  }

  /** Windowed funnel detection — the Flink-CEP / SQL MATCH_RECOGNIZE
    * `PATTERN (A B C) WITHIN interval` surface (the reference's engine
    * family exposes CEP over exactly this kind of clickstream), expressed
    * as ONE window pass instead of per-pattern NFA state or a k-way
    * self-join:
    *
    * A step-2 event qualifies iff SOME step-1 event precedes it (strictly
    * earlier `ts_ms`) within `windowMs`; since "exists A in [ms−W, ms)" ⟺
    * "max(A.ms | A before ms) ≥ ms − W", a running max over a
    * RANGE-to-1-PRECEDING frame decides it exactly — and chaining a second
    * running max over the qualified-step-2 times decides step 3. The whole
    * pattern costs one shuffle by user, one sort, two O(1)-state window
    * functions, and a final agg that reuses the window partitioning (no
    * second exchange). A k-step funnel is k−1 chained maxes, never the
    * eventsᵏ join blow-up; per-user window state is O(1) regardless of
    * history length, so the plan survives 100× event cardinality untouched.
    *
    * Output per user: per-step qualifying counts and the earliest valid
    * completion time (−1 when the user never converts). Exact, integer, and
    * order-independent (defined on `ts_ms` values, not scan order) — so the
    * hash compare holds across partitionings and engines. */
  def funnel(spark: SparkSession, dir: String,
             steps: Seq[String] = Seq("view", "click", "purchase"),
             windowMs: Long = 86400000L): DataFrame =
    funnelOver(Tables.events(spark, dir), steps, windowMs)

  /** [[funnel]] core over any (user_id, event_type, ts_ms) relation, for
    * ANY number of steps ≥ 2: step i's qualifying times are one chained
    * running max over step i−1's — k−1 window functions sharing ONE
    * partitioning and sort, still a single shuffle. */
  def funnelOver(events: DataFrame, steps: Seq[String],
                 windowMs: Long): DataFrame = {
    require(steps.length >= 2, "funnel: at least two steps")
    val ev = events.select("user_id", "event_type", "ts_ms")
    // strictly-earlier frame: RANGE to 1 PRECEDING excludes ts_ms ties
    val before = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val q0 = ev.withColumn("q_0",
      when(col("event_type") === steps(0), col("ts_ms")))
    val qualified = steps.indices.drop(1).foldLeft(q0) { (df, i) =>
      df.withColumn(s"m_${i - 1}", max(col(s"q_${i - 1}")).over(before))
        .withColumn(s"q_$i",
          when(col("event_type") === steps(i) &&
            col(s"m_${i - 1}") >= col("ts_ms") - windowMs, col("ts_ms")))
    }
    val last = steps.length - 1
    val stepCounts = steps.indices.map(i =>
      count(col(s"q_$i")).as(s"n_step${i + 1}"))
    qualified.groupBy("user_id").agg(
      stepCounts.head, stepCounts.tail :+
        coalesce(min(col(s"q_$last")), lit(-1L)).as("first_conv_ms"): _*)
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands pattern (the other classic sequence-analytics query
    * next to the funnel; SQL MATCH_RECOGNIZE's `B+ ORDER BY day` shape):
    * distinct active days → island id = day − row_number (constant within
    * a consecutive run, strictly decreasing across gaps) → island extents
    * → per-user best by (length DESC, start ASC). Three aggregations, but
    * only TWO exchanges: the island window, the island groupBy, and the
    * per-user pick all cluster by user_id, so the first shuffle's
    * partitioning carries through — and every post-distinct relation is
    * (user × islands)-sized, never event-sized. */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
      .distinct()
    val byDay = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("grp", col("day") - row_number().over(byDay))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    val pick = Window.partitionBy("user_id")
      .orderBy(col("len").desc, col("start_day"))
    islands
      .withColumn("n_streaks", count(lit(1)).over(Window.partitionBy("user_id")))
      .withColumn("__rn", row_number().over(pick)).filter(col("__rn") === 1)
      .select(col("user_id"), col("len").as("best_len"),
        col("start_day").as("best_start_day"), col("n_streaks"))
  }

  /** Weekly retention cohorts — the (cohort week × weeks-since-signup →
    * active users) matrix every growth dashboard draws: distinct active
    * (user, week) pairs, each user's cohort = their first active week via
    * ONE window min (no self-join back to a firsts table), then a count
    * per (cohort, offset). Rows entering the final agg are already
    * distinct (user, week), so a plain count IS the distinct-user count —
    * no count_distinct Expand. Two exchanges, both over user×weeks-sized
    * relations, never raw events. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val weeks = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ms div 604800000").as("week"))
      .distinct()
    val byUser = Window.partitionBy("user_id")
    weeks
      .withColumn("cohort", min(col("week")).over(byUser))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Event-transition matrix (first-order Markov counts over each user's
    * clickstream — the "what follows what" table behind next-action
    * prediction and anomalous-flow detection): successor = one `lead` over
    * the per-user time order (ties broken by event_id, so the sequence is
    * total and engine-deterministic), then one count per (from, to) pair
    * plus an integer per-mille rate against the from-state total. One
    * shuffle for the window; the transition aggregation and the from-state
    * window reuse nothing event-sized — the matrix is |types|² rows. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val fromTotal = Window.partitionBy(col("from_type"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_ms"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__total", sum(col("n")).over(fromTotal))
      .withColumn("per_mille", expr("cast((n * 1000) div __total AS BIGINT)"))
      .drop("__total")
  }

  /** Journey analysis: the distribution of each user's FIRST-k event path
    * (onboarding-flow mining — which entry sequences are common, which
    * convert). Scale shape: a `row_number ≤ k` window prefilter cuts every
    * user to k rows BEFORE any aggregation (the grouped-top-k shape the
    * TopKRewrite also optimizes), so the journey-string assembly touches
    * k·|users| rows, never the event stream; ordering is total via
    * (ts_ms, event_id), so the path strings are engine-deterministic. */
  def topJourneys(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(byUser)).filter(col("rn") <= k)
      .groupBy("user_id")
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("rn"), col("event_type")))),
        x => x.getField("event_type")), ">").as("journey"))
      .groupBy("journey").agg(count(lit(1)).as("n_users"))
  }

  /** Weekly engagement stickiness (the DAU/WAU ratio as exact integers:
    * per week, Σ daily-active counts ×1000 div (7 × weekly-active count) —
    * how much of the week the average weekly-active user shows up).
    * Everything runs over the distinct (user, day) relation; the daily and
    * weekly rollups are both week-cardinality-sized, and the division is
    * integer per-mille so the result is hash-exact cross-engine. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
      .distinct()
      .withColumn("week", expr("day div 7"))
    val daily = d.groupBy("week", "day").agg(count(lit(1)).as("n"))
      .groupBy("week").agg(sum(col("n")).as("sum_daily"))
    val weekly = d.select("user_id", "week").distinct()
      .groupBy("week").agg(count(lit(1)).as("weekly_active"))
    daily.join(weekly, Seq("week"))
      .select(col("week"), col("sum_daily"), col("weekly_active"),
        expr("cast((sum_daily * 1000) div (7 * weekly_active) AS BIGINT)")
          .as("stickiness_per_mille"))
  }

  /** UNPIVOT / melt — the inverse of r32's pivot (ANSI UNPIVOT, Spark
    * `Dataset.unpivot`, DuckDB UNPIVOT): wide lineitem measures rewritten
    * long, one (metric, value) row per measure. Spark plans the unpivot
    * as ONE map-side Expand (k output rows per input row — no shuffle, no
    * join, no per-measure rescan), which feeds a partial-aggregated
    * per-metric checksum so the gate output stays group-sized; at 100 TB
    * the Expand is the only correct shape (the naive alternative — one
    * scan per measure UNIONed — reads the table k times). Sums are exact
    * integer micros, hash-comparable cross-engine. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount")
      .unpivot(
        Array(col("l_returnflag"), col("l_linestatus")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .groupBy("l_returnflag", "l_linestatus", "metric")
      .agg(sum(round(col("value") * lit(1e6)).cast("long")).as("sum_micros"),
        count(lit(1)).as("n"))

  /** Window DISTRIBUTION analytics — the ranking family r17 doesn't
    * cover: NTILE quartiles, PERCENT_RANK, CUME_DIST per order status.
    * One window (ONE shuffle + per-partition sort) serves all three.
    * The window order is the TOTAL order (o_totalprice, o_orderkey):
    * NTILE assigns by row POSITION, so under ties its buckets are
    * undefined without a tiebreak — the total order makes all three
    * functions engine-deterministic. Ratios rounded to 6 dp (IEEE
    * division of exact ints — identical cross-engine). */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
  }

  /** STORAGE-BUCKETED co-located join (the write-once/join-free contract
    * a 100 TB fact table lives by): lineitem and orders are written ONCE
    * as bucketed tables — 8 buckets on the join key, bucket-sorted — and
    * every later join on that key reads both sides ALREADY
    * hash-partitioned: no exchange on either input, straight to
    * SortMergeJoin. The shuffle a repeated join would pay per query is
    * paid once at write time; at 1000 executors that is the difference
    * between a metadata-planned scan-join and re-shuffling the fact
    * table every morning. Asserted in-entry (with broadcast disabled so
    * tiny SFs can't mask it): the ONLY exchange in the plan is the final
    * aggregation's, and the join is a SortMergeJoin over bucketed scans.
    * Money in integer micros; must equal the plain join aggregate — the
    * oracle. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val liName = "graft_bucketed_lineitem"
    val ordName = "graft_bucketed_orders"
    spark.sql(s"DROP TABLE IF EXISTS $liName")
    spark.sql(s"DROP TABLE IF EXISTS $ordName")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", graft.TempDirs.create("bucket-li")).saveAsTable(liName)
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", graft.TempDirs.create("bucket-ord")).saveAsTable(ordName)
    def micros(c: Column) = sum(round(c * lit(1e6)).cast("long"))
    def joined = spark.table(liName)
      .join(spark.table(ordName), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        micros(col("l_quantity")).as("sum_qty_micros"),
        micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev_micros"))
    // pin the co-location property with broadcast off: exactly one
    // exchange (the final agg) and a sort-merge join over bucketed scans
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString()
      require(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
        s"bucketed join must plan exactly one exchange (the agg):\n$p")
      require(p.contains("SortMergeJoin"),
        s"bucketed join must sort-merge over co-located buckets:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    joined
  }

  /** TPC-H Q1 pricing-summary shape — THE canonical columnar scan+agg:
    * date-filtered lineitem rolled up by flag/status. Money math in
    * integer MICROS (each per-row product rounded ONCE, then long sums —
    * bit-identical across engines/partitionings where naive double sums
    * are not). Plan: pushed scan filter → partial agg → one exchange
    * over group-sized state; at 100 TB this is bandwidth-bound scan work
    * with nothing wide. */
  def tpchQ1(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    def micros(c: Column) = sum(round(c * lit(1e6)).cast("long"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= cut)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        micros(col("l_quantity")).as("sum_qty_micros"),
        micros(col("l_extendedprice")).as("sum_base_micros"),
        micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_micros"),
        micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge_micros"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3 shipping-priority shape — the canonical 3-way
    * join + grouped-revenue + top-k: BUILDING customers' orders placed
    * before the cut whose items shipped after it, top 10 by revenue.
    * The filtered customer keys BROADCAST into orders; the
    * lineitem⋈orders join stays a key shuffle (at 100 TB the date-
    * filtered orders side is far beyond broadcast — AQE may still
    * broadcast it at small SF). Revenue in integer micros;
    * (revenue DESC, o_orderkey) total order so the top-k is
    * engine-deterministic; TakeOrdered replaces a global sort. */
  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(1e6))
          .cast("long").as("rev_micros"))
    li.join(ord.join(broadcast(cust),
        ord("o_custkey") === cust("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev_micros")).as("revenue_micros"))
      .select(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("revenue_micros"))
      .orderBy(col("revenue_micros").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q6 forecasting-revenue shape — the canonical pushdown probe:
    * three scan-level range predicates and ONE global sum, no join, no
    * group. The whole query should collapse to a pushed parquet scan +
    * partial/final agg of a single long. */
  def tpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(round(col("l_extendedprice") * col("l_discount") * lit(1e6))
          .cast("long")).as("revenue_micros"),
        count(lit(1)).as("n"))

  /** Skew-salted join checked against the plain join: salting must be a
    * pure execution-strategy change, never a semantic one. */
  def saltedJoinOrders(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedJoin(
        Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        Tables.customer(spark, dir).select("c_custkey", "c_name"),
        "o_custkey", "c_custkey", salt = 8)
      .select("o_orderkey", "c_name", "o_totalprice")
}
