package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.lake.MorTable

/** Structured Streaming surface: the reference's continuous-query semantics
  * (R2/R3 streaming scans, T1 checkpoint-aligned commits, T3 update
  * propagation) expressed with `readStream`/`writeStream`, watermarks,
  * windowed aggregation, and keyed state (`mapGroupsWithState`).
  *
  * The reference has no event-time windowing (SURVEY §2.4) — its streaming
  * is changelog propagation — but a training-data pipeline at 100 TB needs
  * watermarked aggregation and sessionization, so they're first-class here.
  */
object StreamingOps {

  /** Typed event row (events.parquet shape, ts as epoch millis). */
  case class Event(user_id: Long, event_id: Long, event_type: String,
                   value: Double, ts_ms: Long)

  /** Running "last event per user" keyed state. */
  case class UserLast(user_id: Long, event_id: Long, value: Double, ts_ms: Long)

  /** R2/R3 — continuous scan of a file-based changelog: new envelope parquet
    * files under `watchDir` become micro-batches (the WAL-tail analog;
    * zpln:1147). `schemaFrom` supplies the envelope schema. */
  def changelogStream(spark: SparkSession, watchDir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1") // one log segment = one micro-batch
      .parquet(watchDir)

  /** S8/T1 — continuous INSERT INTO the lake: every micro-batch applied as
    * exactly one MOR commit keyed by the streaming batchId (zpln:89
    * "Hudi commits … with each checkpoint"). */
  def streamChangelogToMor(changelog: DataFrame, table: MorTable,
                           checkpointDir: String,
                           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.applyChangelog(batch, batchId): Unit
      }
      .start()

  /** [[streamChangelogToMor]] for the PARTITIONED lake form: each
    * micro-batch lands as one staged cluster write + per-partition
    * metadata adoption (PartitionedMorTable.applyChangelog), same
    * batchId exactly-once. */
  def streamChangelogToPartitionedMor(changelog: DataFrame,
                                      table: graft.lake.PartitionedMorTable,
                                      checkpointDir: String,
                                      trigger: Trigger = Trigger.AvailableNow(),
                                      tiebreak: Seq[String] = Nil): StreamingQuery =
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.applyChangelog(batch, batchId, tiebreak): Unit
      }
      .start()

  /** Watermarked tumbling-window aggregate (event time, 1h windows, late
    * data beyond `lateness` dropped once the watermark passes). Works on a
    * streaming or batch DataFrame with a TimestampType `ts`. */
  def windowedCounts(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup: drop events whose `idCols` were already seen,
    * with state bounded by the watermark (an id older than the watermark
    * can't reappear, so its state is evicted — the streaming twin of
    * Dedup.exactDedup that a 100 TB/day ingest needs to not grow state
    * forever). `events` must carry a TimestampType `ts`. */
  def streamingDedup(events: DataFrame, idCols: Seq[String],
                     lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Input row for streaming sessionization (ns order ties broken like the
    * batch operator: (ts_ns, event_id)). */
  case class SessionEvent(user_id: Long, event_id: Long, ts_ns: Long, ts_ms: Long)

  /** The one open session per user carried across micro-batches. */
  case class OpenSession(start_ms: Long, end_ms: Long, n: Long, sid: Long)

  /** A closed session (columns match RelationalOps.sessionize / oracle r15). */
  case class Session(user_id: Long, session_id: Long, session_start_ms: Long,
                     session_end_ms: Long, n_events: Long)

  /** Streaming sessionization via flatMapGroupsWithState: the custom-state
    * form of the batch gap-window operator ([[graft.operators.RelationalOps
    * .sessionize]]). Per user, consecutive events ≤ `gapMs` apart extend the
    * open session held in state; a bigger gap EMITS the closed session and
    * opens the next (session ids numbered 1.. per user in time order, same
    * as the batch cumulative-sum). Sessions therefore close on data
    * evidence, not timers — deterministic under AvailableNow drains where
    * event-time timeouts may never fire for the watermark tail. State is
    * one O(1) record per user (not the events), so 100 TB/day of clicks
    * holds |active users| state; pair with an event-time timeout in an
    * unbounded deployment to also bound |users|.
    *
    * Events within a micro-batch may arrive unordered (sorted here);
    * ACROSS batches the caller must feed time-ordered files (the file
    * source's mtime order), or a stale event would extend a newer session. */
  def sessionizeStream(events: Dataset[SessionEvent],
                       gapMs: Long = 1800000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val evs = it.toArray
          java.util.Arrays.sort(evs, Ordering.by((e: SessionEvent) => (e.ts_ns, e.event_id)))
          val out = Seq.newBuilder[Session]
          var cur = state.getOption.orNull
          evs.foreach { e =>
            if (cur == null) cur = OpenSession(e.ts_ms, e.ts_ms, 1L, 1L)
            else if (e.ts_ms - cur.end_ms <= gapMs)
              cur = OpenSession(cur.start_ms, math.max(cur.end_ms, e.ts_ms),
                cur.n + 1L, cur.sid)
            else {
              out += Session(uid, cur.sid, cur.start_ms, cur.end_ms, cur.n)
              cur = OpenSession(e.ts_ms, e.ts_ms, 1L, cur.sid + 1L)
            }
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
  }

  /** Typed row for the streaming funnel. */
  case class FunnelEvent(user_id: Long, event_type: String, ts_ms: Long)

  /** O(1) per-user CEP state for a k-step funnel: latest QUALIFIED time
    * per non-final step (k−1 maxima; Long.MinValue = none yet), per-step
    * qualifying counts, earliest completion. */
  case class FunnelProgress(maxes: Seq[Long], counts: Seq[Long], min_conv: Long)

  /** Per-user funnel result (columns match RelationalOps.funnel / r40). */
  case class FunnelRow(user_id: Long, n_step1: Long, n_step2: Long,
                       n_step3: Long, first_conv_ms: Long)

  /** Per-user k-step funnel result (general form). */
  case class FunnelCounts(user_id: Long, step_counts: Seq[Long],
                          first_conv_ms: Long)

  /** Streaming windowed funnel via flatMapGroupsWithState — the CEP
    * `PATTERN (A B C) WITHIN interval` operator in its continuous form
    * (Flink CEP's natural home is exactly this streaming clickstream; the
    * batch twin is [[graft.operators.RelationalOps.funnel]], and both are
    * hash-checked against ONE oracle). State per user is O(1) — two
    * running maxima, three counters, one minimum — regardless of history
    * length, the property that lets 100 TB/day of events hold only
    * |active users| state. A `sentinel` event emits the user's row (the
    * AvailableNow-deterministic close, same device as sessionizeStream).
    *
    * Within a batch, events are processed in ascending-`ts_ms` phases:
    * all events at one timestamp are qualified against the PRE-timestamp
    * maxima before any of them update state — the exact strictly-earlier
    * tie rule of the batch window's RANGE-to-1-PRECEDING frame, so the
    * result is independent of intra-batch arrival order. Across batches
    * the caller feeds time-ordered files (file-source mtime order). */
  def funnelStream(events: Dataset[FunnelEvent],
                   steps: Seq[String], windowMs: Long): Dataset[FunnelRow] = {
    require(steps.length == 3, "funnelStream: FunnelRow is the 3-step shape" +
      " — use funnelStreamCounts for other arities")
    import events.sparkSession.implicits._
    funnelStreamCounts(events, steps, windowMs).map(c =>
      FunnelRow(c.user_id, c.step_counts(0), c.step_counts(1),
        c.step_counts(2), c.first_conv_ms))
  }

  /** The k-step engine behind [[funnelStream]] (same semantics for any
    * number of steps ≥ 2, matching [[graft.operators.RelationalOps
    * .funnelOver]]'s chained-max definition). */
  def funnelStreamCounts(events: Dataset[FunnelEvent],
                         steps: Seq[String],
                         windowMs: Long): Dataset[FunnelCounts] = {
    require(steps.length >= 2, "funnelStreamCounts: at least two steps")
    import events.sparkSession.implicits._
    val none = Long.MinValue
    val k = steps.length
    val idx = steps.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelCounts](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          val all = it.toArray
          val evs = all.filter(e => idx.contains(e.event_type))
          java.util.Arrays.sort(evs, Ordering.by((e: FunnelEvent) => e.ts_ms))
          val st = state.getOption.getOrElse(
            FunnelProgress(Seq.fill(k - 1)(none), Seq.fill(k)(0L), -1L))
          val maxes = st.maxes.toArray
          val counts = st.counts.toArray
          var minConv = st.min_conv
          var i = 0
          while (i < evs.length) {
            var j = i
            while (j < evs.length && evs(j).ts_ms == evs(i).ts_ms) j += 1
            // phase 1: qualify this timestamp's events against pre-ts maxima
            val adds = Array.fill(k - 1)(none)
            var p = i
            while (p < j) {
              val e = evs(p)
              val s = idx(e.event_type)
              val ok = s == 0 ||
                (maxes(s - 1) != none && maxes(s - 1) >= e.ts_ms - windowMs)
              if (ok) {
                counts(s) += 1
                if (s < k - 1) { if (e.ts_ms > adds(s)) adds(s) = e.ts_ms }
                else minConv =
                  if (minConv == -1L) e.ts_ms else math.min(minConv, e.ts_ms)
              }
              p += 1
            }
            // phase 2: this timestamp's events become visible predecessors
            var s = 0
            while (s < k - 1) {
              if (adds(s) > maxes(s)) maxes(s) = adds(s)
              s += 1
            }
            i = j
          }
          // `sentinel` CLOSES the user: emit the row and REMOVE the state
          // (in a continuous deployment, NoTimeout + keep would grow state
          // by every user ever seen, and a repeated sentinel would re-emit
          // the same row each batch in append mode). A post-sentinel event
          // for the user starts a fresh funnel — the close contract.
          if (all.exists(_.event_type == "sentinel")) {
            state.remove()
            Iterator.single(FunnelCounts(uid, counts.toSeq, minConv))
          } else {
            state.update(FunnelProgress(maxes.toSeq, counts.toSeq, minConv))
            Iterator.empty
          }
      }
  }

  /** T3 in update mode — keyed running state via mapGroupsWithState: the
    * latest event per user, re-emitted whenever it changes (the streaming
    * twin of RelationalOps.dedupLastWriteWins). */
  def lastEventPerUser(events: Dataset[Event]): Dataset[UserLast] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserLast, UserLast](GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserLast]) =>
          val incoming = it.maxBy(e => (e.ts_ms, e.event_id))
          val newer = state.getOption.forall(s =>
            s.ts_ms < incoming.ts_ms ||
              (s.ts_ms == incoming.ts_ms && s.event_id < incoming.event_id))
          val best =
            if (newer) UserLast(uid, incoming.event_id, incoming.value, incoming.ts_ms)
            else state.get
          state.update(best)
          best
      }
  }
}
