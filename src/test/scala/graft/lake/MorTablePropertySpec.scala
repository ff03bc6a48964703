package graft.lake

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Model-based randomized test: any sequence of upsert/delete changelog
  * batches applied to a MorTable equals the same sequence folded over a
  * plain Map (the last-write-wins reference model). Runs several seeded
  * random scripts across compaction thresholds so snapshots cross the
  * delta-only, base-only, and base+log read shapes. */
class MorTablePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Op(delete: Boolean, key: String, v: Int)

  test("MorTable == Map fold for random upsert/delete scripts (incl. compaction)") {
    val keys = Vector("a", "b", "c", "d", "e")
    for (trial <- 0 until 6) {
      val rnd = new scala.util.Random(1000 + trial)
      val deltaCommits = Seq(2, 3, 100)(trial % 3)
      val script = List.fill(rnd.nextInt(4) + 2)(
        List.fill(rnd.nextInt(5) + 1)(
          Op(rnd.nextInt(4) == 0, keys(rnd.nextInt(keys.size)), rnd.nextInt(1000))))

      val t = MorTable(spark, TestSpark.tmpDir("mor-prop"), Seq("k"),
        compactionDeltaCommits = deltaCommits)
      var model = Map.empty[String, Int]
      script.zipWithIndex.foreach { case (batch, bi) =>
        // within a batch, the LAST op per key wins (arrival-order LWW)
        val lastPerKey = batch.zipWithIndex.groupBy(_._1.key)
          .map { case (_, ops) => ops.maxBy(_._2) }
        val upserts = lastPerKey.collect { case (op, i) if !op.delete => (op.key, op.v, i) }.toSeq
        val deletes = lastPerKey.collect { case (op, _) if op.delete => op.key }.toSeq
        val rows =
          upserts.map { case (k, v, i) => ("U", k, v, i.toLong) } ++
            deletes.map(k => ("D", k, model.getOrElse(k, 0), 999L))
        val env = rows.toDF("op", "k", "v", "seq")
          .select(col("op"), col("k").as("key"),
            when(col("op") === "D", struct(col("k"), col("v"))).as("before"),
            when(col("op") =!= "D", struct(col("k"), col("v"))).as("after"),
            col("seq"))
        t.applyChangelog(env, batchId = bi.toLong)
        upserts.foreach { case (k, v, _) => model += (k -> v) }
        deletes.foreach(k => model -= k)
      }
      val got = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == model,
        s"trial=$trial deltaCommits=$deltaCommits script=$script")
      t.drop()
    }
  }

  test("upsertIfNew mixed into random scripts == Map fold; the insert-only flag never lies") {
    val keys = Vector("a", "b", "c", "d", "e", "f")
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(3000 + trial)
      val t = MorTable(spark, TestSpark.tmpDir("mor-ifnew-prop"), Seq("k"),
        compactionDeltaCommits = 1000)
      var model = Map.empty[String, Int]
      var bi = 0L
      for (step <- 0 until rnd.nextInt(5) + 4) {
        rnd.nextInt(5) match {
          case 0 => // plain upsert with arbitrary overlap (key-collapsed)
            bi += 1
            val rows = List.fill(rnd.nextInt(3) + 1)(
              (keys(rnd.nextInt(keys.size)), rnd.nextInt(1000)))
            val lastPer = rows.groupBy(_._1).map(_._2.last).toSeq
            t.upsert(lastPer.toDF("k", "v"), Nil, batchId = bi)
            lastPer.foreach { case (k, v) => model += (k -> v) }
          case 1 | 2 => // tagged upsert: sometimes fresh keys, sometimes overlap
            bi += 1
            val ks =
              if (rnd.nextBoolean()) List.fill(rnd.nextInt(2) + 1)(
                s"n$trial-$step-${rnd.nextInt(10)}").distinct
              else rnd.shuffle(keys).take(rnd.nextInt(3) + 1).toList
            val rows = ks.map(k => (k, rnd.nextInt(1000)))
            val proven = t.upsertIfNew(rows.toDF("k", "v"), Seq(col("v")), batchId = bi)
            if (proven) assert(ks.forall(k => !model.contains(k)),
              s"trial=$trial step=$step: flag claimed new for a live key")
            rows.foreach { case (k, v) => model += (k -> v) }
          case 3 if t.timeline().nonEmpty => // delete present-or-absent keys
            bi += 1
            val ks = rnd.shuffle(keys ++ model.keys).take(rnd.nextInt(2) + 1).distinct
            t.delete(ks.toDF("k"), batchId = bi)
            ks.foreach(k => model -= k)
          case 4 if t.timeline().nonEmpty =>
            if (rnd.nextBoolean()) t.compact() else t.compactMinor()
          case _ => () // nothing committed yet — skip the step
        }
      }
      val got = t.read().collect().map(r => r.getString(0) -> r.getInt(1))
      assert(got.length == model.size && got.toMap == model,
        s"trial=$trial got=${got.toSeq.sorted} model=${model.toSeq.sorted}")
      t.drop()
    }
  }

  test("mergeInto == Map fold for random merge scripts (incl. minor compaction)") {
    val keys = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(2000 + trial)
      val t = MorTable(spark, TestSpark.tmpDir("mor-merge-prop"), Seq("k"),
        compactionDeltaCommits = 1000)
      var model = Map.empty[String, Int]
      // seed state
      val seed = keys.take(5).map(k => (k, rnd.nextInt(100)))
      t.upsert(seed.toDF("k", "v"), orderWithinBatch = Nil, batchId = 0L)
      model ++= seed
      t.compact() // manifest stats exist → later compactMinor takes the minor path
      for (bi <- 1 to 4) {
        // random key-distinct source; delete threshold on the TARGET value
        val srcKeys = rnd.shuffle(keys).take(rnd.nextInt(4) + 2)
        val src = srcKeys.map(k => (k, rnd.nextInt(1000)))
        val delBelow = rnd.nextInt(500)
        t.mergeInto(src.toDF("k", "v"),
          matchedSet = Map("v" -> col("s.v")),
          matchedDelete = Some(col("t.v") < delBelow),
          insertWhen = col("s.v") >= 100,
          batchId = bi.toLong)
        src.foreach { case (k, v) =>
          model.get(k) match {
            case Some(tv) if tv < delBelow => model -= k      // matched delete
            case Some(_) => model += (k -> v)                  // matched update
            case None if v >= 100 => model += (k -> v)         // conditional insert
            case None => ()                                    // insert filtered
          }
        }
        if (bi == 2) t.compactMinor()
      }
      val got = t.read().collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == model, s"trial=$trial")
      t.drop()
    }
  }
}
