package graft

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** Temp workspace for replay-style queries (LakeQueries, PipelineQueries)
  * and Spark scratch (shuffle/local dirs).
  *
  * Placement matters more than it looks: on this harness, disk-backed /tmp
  * writes ~13 MB/s with the cost paid in SYSTEM CPU (2 GB + sync ≈ 155 s of
  * kernel time), which stalls every concurrently-running task — the bench
  * degraded up to 10× mid-suite purely from parquet/shuffle writeback. The
  * same write to tmpfs takes 1.6 s. So all scratch goes to /dev/shm when
  * present (RAM-backed, 126 G here), falling back to java.io.tmpdir.
  *
  * Layout: `<base>/graft-<pid>/…`, deleted by a JVM shutdown hook; on
  * startup any `graft-<pid>` left by a dead process (crashed run) is
  * removed so RAM never leaks across runs. Replay-style queries reclaim
  * their dirs eagerly via [[materializeAndDelete]]; the hook bounds
  * everything else to one process lifetime.
  */
object TempDirs {

  private val pid = ProcessHandle.current().pid()

  private val base: Path = {
    val shm = Paths.get("/dev/shm")
    val root =
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm.resolve("graft-tmp")
      else Paths.get(System.getProperty("java.io.tmpdir"))
    Files.createDirectories(root)
    // reap scratch of dead JVMs (crashed runs must not pin RAM)
    if (root.getFileName.toString == "graft-tmp") {
      val it = Files.list(root).iterator()
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        if (name.startsWith("graft-")) {
          val owner = name.stripPrefix("graft-").toLongOption
          val alive = owner.exists(o => ProcessHandle.of(o).map[Boolean](_.isAlive).orElse(false))
          if (!alive) deleteRecursively(p)
        }
      }
    }
    val mine = root.resolve(s"graft-$pid")
    Files.createDirectories(mine)
    mine
  }

  private val created = mutable.ArrayBuffer.empty[Path]

  sys.addShutdownHook {
    created.synchronized(created.toList).foreach(deleteRecursively)
    deleteRecursively(base)
  }

  def create(prefix: String): String = {
    val p = Files.createTempDirectory(base, prefix)
    created.synchronized { created += p }
    p.toString
  }

  /** Finish a replay-style query: materialize its (small) result
    * driver-side, then delete `dir` immediately. The returned DataFrame is
    * a local relation, so the replayed lake table is reclaimed the moment
    * the result exists instead of accumulating in tmpfs until JVM exit —
    * a 50+-query Verify/Bench run replays several tables and the shutdown
    * hook alone bounds the leak only to process lifetime. Use only for
    * gate-sized results (≤ a few thousand rows). */
  def materializeAndDelete(df: org.apache.spark.sql.DataFrame, dirs: String*): org.apache.spark.sql.DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    val out = df.sparkSession.createDataFrame(rows, df.schema)
    dirs.foreach(d => deleteRecursively(Paths.get(d)))
    out
  }

  /** A per-JVM Spark local dir (shuffle, block manager) on the fast base.
    * Pass to `spark.local.dir` before session creation. */
  def sparkLocalDir(): String = {
    val p = base.resolve("spark-local")
    Files.createDirectories(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach { f =>
        try Files.deleteIfExists(f) catch { case _: java.io.IOException => }
      }
    }
  }
}
