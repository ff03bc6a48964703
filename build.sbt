ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamingdatalakeflinkcdcapachehudispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench driver tail-captures sbt stdout and parses the FINAL line as
// JSON. sbt's "[success] Total time: ..." epilogue lands AFTER the
// program's own last line, so the parse always failed (BENCH parsed:null
// three rounds running). Suppress the epilogue; Bench prints its short
// summary JSON as the true last stdout line.
Global / showSuccess := false
// ...but forked `run` output still goes through sbt's logger, which
// prefixes every line with "[info] " — the driver's json.loads of the
// last line fails on the prefix. Route the forked JVM's stdout straight
// to sbt's stdout so the final summary JSON line arrives raw.
run / connectInput := false
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs 32 concurrent tasks in one JVM; 8g thrashed GC once a
  // few replay queries had run (bench degraded 2-4x across the suite on a
  // 128 GiB box). 48g keeps full-suite runs flat.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
