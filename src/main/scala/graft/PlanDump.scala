package graft

/** Diagnostic: dump `.explain("formatted")` for named gate entries to
  * files — the evidence artifacts the optimization rounds commit under
  * `plans/r<N>/<query>_{before,after}.txt`.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <entry> [entry ...]
  * writes <outDir>/<entry>_<suffix>.txt per entry. Runs the entry function
  * (many entries build their tables first, then RETURN the read — the
  * returned DataFrame's plan is the query under judgment) and records the
  * FINAL DataFrame's formatted plan. SPARK_GRAFT_SF_DIR picks the data dir
  * (default sf0.01 — plan SHAPE, not timing, is the artifact).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <entry>...")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", TempDirs.sparkLocalDir())
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown entry $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
