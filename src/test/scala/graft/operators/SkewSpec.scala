package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin == plain join on heavily skewed keys") {
    // 10k rows of one hot key + a long tail
    val left = ((1 to 10000).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"tail$i"))).toDF("k", "payload")
    val right = (1 to 101).map(i => (i.toLong, s"dim$i")).toDF("rk", "dim")
    val plain = left.join(right, $"k" === $"rk")
    val salted = Skew.saltedJoin(left, right, "k", "rk", salt = 8)
    assert(salted.count() == plain.count())
    val a = plain.orderBy("k", "payload").collect().map(_.toSeq).toSeq
    val b = salted.select(plain.columns.map(col).toIndexedSeq: _*)
      .orderBy("k", "payload").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("MOR incremental read returns exactly the post-seq changes with tombstones") {
    import graft.lake.MorTable
    val t = MorTable(spark, TestSpark.tmpDir("incr"), Seq("k"), compactionDeltaCommits = 100)
    t.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), Seq(col("v")))          // seq 1
    val mark = t.timeline().last.seq
    t.upsert(Seq(("b", 20), ("c", 3)).toDF("k", "v"), Seq(col("v")))         // seq 2
    t.delete(Seq("a").toDF("k"))                                             // seq 3
    val inc = t.readIncremental(mark)
      .select("k", "v", "_deleted").collect()
      .map(r => r.getString(0) -> ((r.get(1), r.getBoolean(2)))).toMap
    assert(inc.keySet == Set("a", "b", "c"))       // only touched keys
    assert(inc("b") == ((20, false)) && inc("c") == ((3, false)))
    assert(inc("a")._2)                            // tombstone visible
    assert(t.readIncremental(t.timeline().last.seq).isEmpty)
  }
}
