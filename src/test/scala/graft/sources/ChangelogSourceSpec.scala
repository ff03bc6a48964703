package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** CDC envelope + retract semantics, mirroring the reference's goldens:
  * insert Francisco → update to Valentina ⇒ the stream retracts the first
  * row and shows the second (zpln:1674/:1793 observed at :1583, narrative
  * :1870), snapshot→binlog vs binlog-only modes (zpln:1060 vs :1372). */
case class DbzImg(id: java.lang.Long, name: String)
case class DbzEnv(op: String, key: String, before: DbzImg, after: DbzImg, seq: Long)

class ChangelogSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // person-shaped log (FIXTURES.md §1): id, full_name, last_name, first_name
  private def personLog = Seq(
    ("I", 100.0, "Francisco Morillo", "Morillo", "Francisco", 1L),
    ("U", 100.0, "Valentina Sanabria", "Sanabria", "Valentina", 2L),
    ("I", 200.0, "Abby A.J.", "A.J.", "Abby", 3L),
    ("D", 200.0, "Abby A.J.", "A.J.", "Abby", 4L),
  ).toDF("op", "id", "full_name", "last_name", "first_name", "seq")

  test("T3 retract-and-replace: update retracts the first image (zpln:1870)") {
    val log = ChangelogSource.fromOps(personLog, Seq("id"))
    val finalState = ChangelogSource.materialize(log, Seq("id")).collect()
    assert(finalState.length == 1) // id=200 deleted, id=100 updated once
    assert(finalState.head.getAs[String]("full_name") == "Valentina Sanabria")
  }

  test("before-images come from the prior after-image (REPLICA IDENTITY FULL)") {
    val log = ChangelogSource.fromOps(personLog, Seq("id"))
    val upd = log.filter($"op" === "U").head()
    assert(upd.getStruct(upd.fieldIndex("before")).getAs[String]("full_name")
      == "Francisco Morillo")
    val ins = log.filter($"op" === "I" && $"seq" === 1L).head()
    assert(ins.isNullAt(ins.fieldIndex("before")))
    val del = log.filter($"op" === "D").head()
    assert(del.isNullAt(del.fieldIndex("after")))
  }

  test("S3 snapshot→binlog: snapshot rows then log; materialize = final state") {
    val snap = Seq((1.0, "Abby Aboushi", "Aboushi", "Abby"))
      .toDF("id", "full_name", "last_name", "first_name")
    val log = ChangelogSource.fromOps(personLog, Seq("id"))
    val all = ChangelogSource.snapshotThenStream(snap, log, Seq("id"))
    val m = ChangelogSource.materialize(all, Seq("id"))
      .orderBy("id").select("full_name").as[String].collect().toSeq
    assert(m == Seq("Abby Aboushi", "Valentina Sanabria"))
  }

  test("S4 binlog-only from offset: earlier changes invisible") {
    val log = ChangelogSource.fromOps(personLog, Seq("id"))
    val tail = ChangelogSource.streamOnly(log, fromSeq = 2L)
    assert(tail.agg(min("seq")).head().getLong(0) == 3L)
  }

  test("R2 incremental state maintenance equals one-shot materialize") {
    val log = ChangelogSource.fromOps(personLog, Seq("id"))
    val empty = ChangelogSource.materialize(log.limit(0), Seq("id"))
    val bounds = ChangelogSource.microBatchBounds(log, 3)
    val folded = bounds.foldLeft(empty) { case (st, (s, e)) =>
      ChangelogSource.applyToState(st, log.filter($"seq".between(s, e)), Seq("id"))
    }
    val oneShot = ChangelogSource.materialize(log, Seq("id"))
    assert(folded.orderBy("id").collect().toSeq == oneShot.orderBy("id").collect().toSeq)
  }

  test("outbound Debezium export round-trips through the wire parser exactly") {
    // tricky payloads on purpose: quotes, newline, unicode, null images
    val gnarly = "b\"x\nü|,"
    val out = Seq(
      DbzEnv("I", "1", null, DbzImg(1L, "a"), 1L),
      DbzEnv("U", "1", DbzImg(1L, "a"), DbzImg(1L, gnarly), 2L),
      DbzEnv("I", "2", null, DbzImg(2L, null), 3L),
      DbzEnv("D", "1", DbzImg(1L, gnarly), null, 4L)).toDS().toDF()
    val dir = TestSpark.tmpDir("dbz-out")
    val seg = DebeziumSource.writeJsonSegment(out, "t1", dir, 7L)
    assert(seg.endsWith("segment-000000007.jsonl"))
    val imgSchema = Seq.empty[DbzImg].toDS().schema
    val parsed = spark.read
      .schema(DebeziumSource.wireSchema(imgSchema)).json(dir)
    val back = DebeziumSource.envelope(parsed,
      DebeziumSource.Table("t1", Seq("id", "name"), Seq("id")))
    def flat(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "op", "key", "before.id", "before.name", "after.id", "after.name", "seq")
      .collect().map(_.toSeq).sortBy(_.last.asInstanceOf[Long].toString)
    assert(flat(back).toSeq == flat(out).toSeq)
  }
}
