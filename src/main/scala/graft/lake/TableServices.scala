package graft.lake

import java.util.concurrent.{Executors, ScheduledExecutorService, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

/** Async table services — the Hudi async-compaction / async-clean runner
  * (Hudi's `compaction.async.enabled` table service; the reference's Flink
  * job compacts its Hudi sinks asynchronously while the pipeline keeps
  * committing deltas, `CDC-Hudi-Notebook.zpln:292` declares the cadence).
  *
  * The service is deliberately a THIN scheduler: all concurrency safety
  * lives in the table — compaction racing a live writer is covered by the
  * OCC seq claim + `unfolded` straggler protocol (MultiWriterSpec), and
  * `clean()` racing a reader fails loudly or stays consistent, never a
  * partial merge. So a background thread calling `maybeCompact()`/`clean()`
  * needs no additional locking beyond the table's own `synchronized`
  * sections, and an uncoordinated foreground writer on the SAME handle or
  * another handle/process remains correct by the table's contract.
  *
  * Failure policy: a failed cycle records the error ([[lastError]]) and the
  * service keeps its cadence — one bad compaction attempt (e.g. transient
  * FS) must not silently stop all future compactions. Callers decide when
  * to surface the error. `runOnce()` is public so tests and orchestrators
  * can drive a deterministic cycle without the timer.
  *
  * Scale shape: the service itself does O(1) driver work per tick (one
  * timeline listing via `compactionDue`); actual compaction cost is the
  * table's own (minor/full). One service thread can watch many tables —
  * build one [[TableServices]] per table and share nothing, or schedule
  * them on the caller's own executor via `runOnce()`.
  */
final class TableServices private (
    cycle: () => Boolean,
    periodMs: Long) extends AutoCloseable {

  private val compactions = new AtomicInteger(0)
  private val errRef = new AtomicReference[Option[Throwable]](None)
  @volatile private var exec: Option[ScheduledExecutorService] = None
  @volatile private var task: Option[ScheduledFuture[_]] = None

  /** Most recent cycle failure, if any (cleared by the next success). */
  def lastError: Option[Throwable] = errRef.get()

  /** Number of cycles that actually compacted something. */
  def compactionsRun: Int = compactions.get()

  /** One service cycle: compact if due (then clean, when configured).
    * Returns true iff a compaction ran. Never throws — see failure policy. */
  def runOnce(): Boolean =
    try {
      val did = cycle()
      if (did) compactions.incrementAndGet()
      errRef.set(None)
      did
    } catch {
      case e: Throwable =>
        errRef.set(Some(e))
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn("async table-service cycle failed (service continues)", e)
        false
    }

  /** Start the background timer (idempotent). Daemon thread — never blocks
    * JVM exit; call [[close]] for an orderly stop. */
  def start(): this.type = synchronized {
    if (exec.isEmpty) {
      val e = Executors.newSingleThreadScheduledExecutor { r =>
        val th = new Thread(r, "graft-table-service")
        th.setDaemon(true)
        th
      }
      // fixed DELAY, not fixed rate: a compaction longer than the period
      // must not queue a burst of immediate re-runs behind itself
      task = Some(e.scheduleWithFixedDelay(() => { runOnce(); () },
        periodMs, periodMs, TimeUnit.MILLISECONDS))
      exec = Some(e)
    }
    this
  }

  /** Stop the timer; an in-flight cycle finishes (table ops are atomic at
    * commit granularity, so interrupting mid-compaction is never needed —
    * an unpublished staging dir is simply ignored by readers). */
  override def close(): Unit = synchronized {
    task.foreach(_.cancel(false))
    exec.foreach { e => e.shutdown(); e.awaitTermination(60, TimeUnit.SECONDS); () }
    task = None
    exec = None
  }
}

object TableServices {
  /** Service around a caller-supplied cycle (custom maintenance: savepoint
    * rotation, manifest export, multi-table coordination). The thunk
    * returns whether it did work this tick. */
  def custom(cycle: () => Boolean, periodMs: Long = 60000L): TableServices =
    new TableServices(cycle, periodMs)

  /** Service for a single table: num_or_time compaction check each tick;
    * `cleanEvery` > 0 additionally runs [[MorTable.clean]] after every Nth
    * compaction (0 = never — the safe default when multi-table batches may
    * still recovery-read old deltas). */
  def apply(t: MorTable, periodMs: Long = 60000L, cleanEvery: Int = 0): TableServices = {
    val sinceClean = new AtomicInteger(0)
    new TableServices(() => {
      val did = t.maybeCompact()
      if (did && cleanEvery > 0 && sinceClean.incrementAndGet() >= cleanEvery) {
        sinceClean.set(0)
        t.clean()
      }
      did
    }, periodMs)
  }

  /** Service for a partitioned table: due children compact in ONE batched
    * staged write per tick ([[PartitionedMorTable.maybeCompact]]);
    * `cleanEvery` > 0 also cleans children + parent timeline after every
    * Nth compacting tick. */
  def apply(p: PartitionedMorTable, periodMs: Long, cleanEvery: Int): TableServices = {
    val sinceClean = new AtomicInteger(0)
    new TableServices(() => {
      val did = p.maybeCompact().nonEmpty
      if (did && cleanEvery > 0 && sinceClean.incrementAndGet() >= cleanEvery) {
        sinceClean.set(0)
        p.clean()
        p.cleanParentTimeline()
      }
      did
    }, periodMs)
  }
}
