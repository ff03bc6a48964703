package graft

import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Temp workspace directories for replay-style queries (LakeQueries,
  * PipelineQueries): created under java.io.tmpdir, tracked, and recursively
  * deleted on JVM exit. Callers return lazily-read DataFrames over these
  * dirs, so eager deletion isn't possible — the shutdown hook bounds the
  * leak to one process lifetime instead of accumulating across runs.
  */
object TempDirs {
  private val created = mutable.ArrayBuffer.empty[Path]

  sys.addShutdownHook {
    created.synchronized(created.toList).foreach(deleteRecursively)
  }

  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.synchronized { created += p }
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
