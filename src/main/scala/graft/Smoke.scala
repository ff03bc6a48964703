package graft
import org.apache.spark.sql.SparkSession

/** Schema-probe utility for the driver testdata. Data dir defaults to the
  * harness location but is overridable: `runMain graft.Smoke <dir>`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // events needs the nanos-safe loader (Tables sets nanosAsLong)
      val ev = Tables.events(spark, dir)
      ev.printSchema()
      ev.show(3, false)
      Tables.documents(spark, dir).printSchema()
      Tables.embeddings(spark, dir).printSchema()
    } finally spark.stop()
  }
}
