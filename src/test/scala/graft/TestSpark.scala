package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", TempDirs.sparkLocalDir())
      // bounded test JVM: cleaner-storm stalls flaked slow suites (see Bench)
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  /** Scratch dir on the fast base (tmpfs when available), reaped at JVM
    * exit — test WAL/checkpoint/lake dirs on the slow disk-backed /tmp
    * caused minute-long writeback stalls and streaming-test flakes. */
  def tmpDir(prefix: String): String = TempDirs.create(prefix)
}
