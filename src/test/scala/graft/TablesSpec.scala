package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The dual-vintage events contract: driver testdata has shipped `ts` as
  * both TIMESTAMP(NANOS)-read-as-long (rounds ≤5, via nanosAsLong) and
  * micro TIMESTAMP_NTZ (round 6+). Tables.tsToNs must normalize either
  * to the same epoch-nanos long surface, and tsRawLit must synthesize
  * sentinel literals in whichever vintage the file actually has. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val epochNs = Seq(1700000000123456000L, 1700003600987654000L)

  test("tsToNs: nanos-long and micro-NTZ vintages normalize identically") {
    // vintage A: ts already a long of epoch nanos
    val longDf = epochNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) }
      .toDF("event_id", "ts")
    // vintage B: ts a micro TIMESTAMP_NTZ of the same instants
    val ntzDf = epochNs.zipWithIndex.map { case (ns, i) => (i.toLong, ns) }
      .toDF("event_id", "ns")
      .select(col("event_id"),
        timestamp_micros(expr("ns div 1000")).cast("timestamp_ntz").as("ts"))
    val a = Tables.tsToNs(longDf).select("event_id", "ts_ns")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Tables.tsToNs(ntzDf).select("event_id", "ts_ns")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, ns) =>
      assert(ns == epochNs(id.toInt), s"long vintage must pass through: $ns")
      // NTZ files are micro precision — normalize truncates to micros
      assert(b(id) == (epochNs(id.toInt) / 1000L) * 1000L,
        s"ntz vintage must be micro-truncated nanos, got ${b(id)}")
    }
  }

  test("tsRawLit: sentinel literal matches each vintage's raw schema") {
    val longDf = Seq((1L, 2L)).toDF("event_id", "ts")
    val ntzDf = Seq((1L, 2L)).toDF("event_id", "ns")
      .select(col("event_id"), timestamp_micros(col("ns")).cast("timestamp_ntz").as("ts"))
    val ns = 1700000000000000000L
    val litLong = longDf.select(Tables.tsRawLit(longDf.schema, ns).as("ts"))
    assert(litLong.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    assert(litLong.head.getLong(0) == ns)
    val litNtz = ntzDf.select(Tables.tsRawLit(ntzDf.schema, ns).as("ts"))
    assert(litNtz.schema("ts").dataType == ntzDf.schema("ts").dataType)
    // round-trips through tsToNs to the same (micro-truncated) instant
    val back = Tables.tsToNs(litNtz.withColumn("event_id", lit(1L)))
      .select("ts_ns").head.getLong(0)
    assert(back == ns)
  }
}
