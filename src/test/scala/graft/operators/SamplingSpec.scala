package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashSample is deterministic, subset-consistent, and ~fraction-sized") {
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
    val n = docs.count().toDouble
    val s1 = Sampling.hashSample(docs, "doc_id", 1, 5)
    val s2 = Sampling.hashSample(docs, "doc_id", 1, 5)
    assert(s1.count() == s2.count()) // re-run selects the same rows
    assert(s1.exceptAll(s2).isEmpty)
    val frac = s1.count() / n
    assert(frac > 0.1 && frac < 0.3, s"~20% expected, got $frac")
    // num/den monotone: a 2/5 sample contains the 1/5 sample
    val bigger = Sampling.hashSample(docs, "doc_id", 2, 5)
    assert(s1.exceptAll(bigger).isEmpty)
  }

  test("quotaPerGroup caps every group at n, deterministically") {
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
    val q = Sampling.quotaPerGroup(docs, "lang", "doc_id", 50)
    val sizes = q.groupBy("lang").count().select("count").as[Long].collect()
    assert(sizes.forall(_ <= 50))
    // groups larger than the quota are cut to exactly n
    val before = docs.groupBy("lang").count()
      .filter(col("count") >= 50).count()
    assert(q.groupBy("lang").count().filter(col("count") === 50).count() == before)
    val q2 = Sampling.quotaPerGroup(docs, "lang", "doc_id", 50)
    assert(q.exceptAll(q2).isEmpty)
    // the two-level rank selects EXACTLY the naive single-window top-n
    // (the bucket is the order key's prefix, so the orders agree)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(Sampling.hashBucket(col("doc_id")), col("doc_id"))
    val naive = docs.withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") <= 50).drop("__rn")
    assert(q.exceptAll(naive).isEmpty && naive.exceptAll(q).isEmpty,
      "two-level quota must equal the single-window rank")
    assert(q.columns.toSeq == docs.columns.toSeq,
      "quota must preserve the caller's column order")
  }

  test("sequencePack: bins respect the budget up to one overflow doc; total preserved") {
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
    val budget = 512
    val packed = Sampling.sequencePack(docs, "doc_id",
      graft.functions.TextAnalysis.tokenCount($"text"), budget = budget).cache()
    assert(packed.count() == docs.count(), "every doc lands in exactly one bin")
    val bins = packed.groupBy("bucket", "bin_id")
      .agg(sum($"n_tokens").as("tok"), max($"n_tokens").as("mx"))
      .collect()
    // greedy packing: a bin exceeds the budget only by its boundary doc
    bins.foreach { r =>
      assert(r.getAs[Long]("tok") < budget + r.getAs[Long]("mx"),
        s"bin ${r.getLong(1)} of bucket ${r.getLong(0)} too full: $r")
    }
    // consecutive bins within a bucket are dense (no empty bin ids skipped
    // unless one doc alone spans multiple budgets)
    val byBucket = bins.groupBy(_.getLong(0))
    byBucket.values.foreach { rs =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head == 0L, "packing starts at bin 0")
    }
    packed.unpersist()
  }

  test("mixtureSample keeps ~per-group fractions, deterministically, as a pure filter") {
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
    val mixed = Sampling.mixtureSample(docs, "lang", "doc_id",
      weights = Seq(("en", 1L, 2L), ("es", 1L, 4L)), default = (1L, 10L)).cache()
    val kept = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    def frac(l: String) = kept.getOrElse(l, 0L).toDouble / total(l)
    assert(frac("en") > 0.35 && frac("en") < 0.65, s"en ~1/2, got ${frac("en")}")
    assert(frac("es") > 0.10 && frac("es") < 0.40, s"es ~1/4, got ${frac("es")}")
    assert(frac("de") < 0.25, s"de ~1/10 default, got ${frac("de")}")
    // deterministic: re-run selects the same rows
    val again = Sampling.mixtureSample(docs, "lang", "doc_id",
      weights = Seq(("en", 1L, 2L), ("es", 1L, 4L)), default = (1L, 10L))
    assert(mixed.exceptAll(again).isEmpty)
    // each group's sample is the hashSample of that group (composability:
    // the mixture is per-group rate filtering, nothing cross-group)
    val enOnly = Sampling.hashSample(docs.filter($"lang" === "en"), "doc_id", 1, 2)
    assert(mixed.filter($"lang" === "en").exceptAll(enOnly).isEmpty)
    mixed.unpersist()
  }

  test("temperatureSample flattens toward p^alpha; smallest group kept whole") {
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Sampling.temperatureSample(docs, "lang", "doc_id", alpha = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val (minLang, minN) = total.minBy(_._2)
    assert(kept(minLang) == minN, "smallest group must keep every row")
    // each group's expected keep count is sqrt(minN * n) (counts ∝ p^0.5
    // with the smallest whole); md5 rates are approximate per group
    total.foreach { case (l, n) =>
      val want = math.sqrt(minN.toDouble * n)
      val got = kept.getOrElse(l, 0L).toDouble
      assert(got > want * 0.6 && got < want * 1.4 + 5,
        s"$l: kept $got, temperature target ~$want of $n")
    }
    // flattening law: the kept head/tail ratio shrinks toward sqrt
    val (maxLang, maxN) = total.maxBy(_._2)
    val natural = maxN.toDouble / minN
    val flattened = kept(maxLang).toDouble / kept(minLang)
    assert(flattened < natural * 0.8,
      s"head/tail ratio must shrink: natural $natural, flattened $flattened")
    // alpha = 1 is the identity (no re-balancing)
    assert(Sampling.temperatureSample(docs, "lang", "doc_id", alpha = 1.0)
      .count() == docs.count())
  }

  test("hashBucket spreads uniformly (chi-square-ish sanity over 16 buckets)") {
    val n = 4096
    val counts = spark.range(n)
      .select((Sampling.hashBucket(col("id")) % 16).as("b"))
      .groupBy("b").count().select("count").as[Long].collect()
    assert(counts.length == 16)
    val expected = n / 16.0
    assert(counts.forall(c => c > expected * 0.7 && c < expected * 1.3),
      s"bucket counts too skewed: ${counts.mkString(",")}")
  }

  test("assignSplits: ~80/10/10, exhaustive+disjoint, key-consistent across tables") {
    val n = 5000L
    val a = spark.range(n).toDF("k")
    val s = Sampling.assignSplits(a, "k")
    val counts = s.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n, "every row gets exactly one split")
    assert(math.abs(counts("train") - 4000) < 300, counts.toString)
    assert(math.abs(counts("valid") - 500) < 150, counts.toString)
    // the SAME key in a different table lands in the same split (join-safe)
    val b = Sampling.assignSplits(
      spark.range(n).toDF("k").sample(0.3, seed = 7), "k")
    val joined = s.join(b.withColumnRenamed("split", "split_b"), "k")
    assert(joined.filter($"split" =!= $"split_b").isEmpty,
      "split assignment must be a pure key function")
  }

  test("tokenBudgetSample: greedy md5-order prefix per group; boundary doc overflows") {
    val docs = spark.range(0, 500)
      .selectExpr("concat('d', id) AS k",
        "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS g",
        "(id % 7 + 1) AS len")
    val out = Sampling.tokenBudgetSample(docs, "g", "k", col("len"),
      budgets = Map("a" -> 50L), defaultBudget = 37L)
    // determinism
    val out2 = Sampling.tokenBudgetSample(docs, "g", "k", col("len"),
      budgets = Map("a" -> 50L), defaultBudget = 37L)
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)
    // per group: the kept set is EXACTLY the greedy md5-order prefix —
    // predecessors' total strictly under the budget keeps the doc
    import org.apache.spark.sql.expressions.Window
    val pre = docs.withColumn("__h", md5(col("k")))
      .withColumn("pre", coalesce(sum(col("len")).over(
        Window.partitionBy(col("g")).orderBy(col("__h"), col("k"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val expect = pre.filter(col("pre") <
        when(col("g") === "a", 50L).otherwise(37L))
      .select(col("k"), col("g"), col("len"), col("len").cast("long").as("n_tokens"))
    val got = out.select("k", "g", "len", "n_tokens")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "kept set must equal the naive one-window greedy prefix")
    // budgets bind: the group total overshoots only by the one boundary doc
    val totA = out.filter(col("g") === "a").agg(sum("n_tokens")).head.getLong(0)
    val mxA = out.filter(col("g") === "a").agg(max("n_tokens")).head.getLong(0)
    assert(totA >= 50L && totA < 50L + mxA, s"group a total $totA vs budget 50")
    // an unlisted group with defaultBudget 0 keeps nothing
    assert(Sampling.tokenBudgetSample(docs, "g", "k", col("len"),
      budgets = Map("a" -> 50L)).filter(col("g") === "b").count() == 0)
  }

  test("corpusShuffle epoch salt: fresh deterministic permutation per salt") {
    val docs = spark.range(0, 1000).selectExpr("concat('d', id) AS k", "id AS v")
    val e1 = Sampling.corpusShuffle(docs, "k", 4, salt = "epoch1")
    val e1b = Sampling.corpusShuffle(docs, "k", 4, salt = "epoch1")
    val e2 = Sampling.corpusShuffle(docs, "k", 4, salt = "epoch2")
    // same salt: byte-identical
    assert(e1.exceptAll(e1b).isEmpty && e1b.exceptAll(e1).isEmpty)
    // different salt: a genuinely different permutation (some key changes
    // shard or position), but still a full contiguous assignment
    val joined = e1.select(col("k"), col("shard_id").as("s1"), col("pos").as("p1"))
      .join(e2.select(col("k"), col("shard_id").as("s2"), col("pos").as("p2")), "k")
    assert(joined.filter(col("s1") =!= col("s2") || col("p1") =!= col("p2")).count() > 0,
      "epoch2 must not repeat epoch1's order")
    assert(e2.count() == 1000)
    val per = e2.groupBy("shard_id").agg(count(lit(1)).as("c"), max("pos").as("mx")).collect()
    per.foreach(r => assert(r.getAs[Long]("mx") == r.getAs[Long]("c")))
  }

  test("corpusShuffle: deterministic, contiguous per-shard positions, == the naive per-shard rank") {
    import org.apache.spark.sql.expressions.Window
    val n = 4000L
    val docs = spark.range(n).selectExpr("concat('doc', id) AS k", "id AS v")
    val a = Sampling.corpusShuffle(docs, "k", nShards = 8)
    // determinism: a re-run is byte-identical (pure key function)
    val b = Sampling.corpusShuffle(docs, "k", nShards = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every row assigned, positions contiguous 1..count within each shard
    assert(a.count() == n)
    val perShard = a.groupBy("shard_id")
      .agg(count(lit(1)).as("c"), min("pos").as("mn"), max("pos").as("mx"),
        countDistinct("pos").as("d")).collect()
    assert(perShard.length == 8, "all 8 shards populated")
    perShard.foreach { r =>
      assert(r.getAs[Long]("mn") == 1L && r.getAs[Long]("mx") == r.getAs[Long]("c")
        && r.getAs[Long]("d") == r.getAs[Long]("c"),
        s"positions must be a contiguous 1..count permutation: $r")
    }
    // md5 spreads uniformly → shards balance
    val sizes = perShard.map(_.getAs[Long]("c"))
    assert(sizes.max < sizes.min * 2, s"shard skew: ${sizes.mkString(",")}")
    // the scale-safe two-level rank equals the naive one-window-per-shard
    // formulation it replaces
    val naive = docs
      .withColumn("__h", md5(col("k")))
      .withColumn("shard_id", pmod(Sampling.hashBucket(col("k")), lit(8L)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard_id")).orderBy(col("__h"), col("k"))).cast("long"))
      .drop("__h")
    assert(a.exceptAll(naive).isEmpty && naive.exceptAll(a).isEmpty,
      "two-level rank must equal the global per-shard rank")
    // writer round-trip: one dir per shard, same rows back
    val out = graft.TempDirs.create("shards-spec")
    val dirs = Sampling.writeShards(docs, "k", nShards = 8, out)
    assert(dirs.length == 8)
    val back = spark.read.parquet(out)
      .select(col("k"), col("v"), col("shard_id").cast("long").as("shard_id"), col("pos"))
    val aSel = a.select("k", "v", "shard_id", "pos")
    assert(back.exceptAll(aSel).isEmpty && aSel.exceptAll(back).isEmpty,
      "shard writer must round-trip the shuffled corpus")
  }

  test("concatPack: exact md5-order prefix sums, window arithmetic, invariances") {
    val docs = Seq(("a", 5L), ("b", 0L), ("c", 10L), ("d", 3L), ("e", 7L),
      ("f", 8L)).toDF("doc_id", "nt")
    val got = Sampling.concatPack(docs, "doc_id", col("nt"), seqLen = 8L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // scala reference over the same md5 total order
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val counts = Map("a" -> 5L, "b" -> 0L, "c" -> 10L, "d" -> 3L,
      "e" -> 7L, "f" -> 8L)
    val order = counts.keys.toSeq.sortBy(k => (md5hex(k), k))
    var off = 0L
    val expect = order.map { k =>
      val n = counts(k)
      val e = k -> ((n, off, off / 8L,
        math.max(off, off + n - 1) / 8L))
      off += n
      e
    }.toMap
    assert(got == expect, s"got $got expect $expect")
    // the stream is a partition: sorted by offset, each start is the
    // previous end (zero-token docs share their successor's offset)
    val sorted = got.values.toSeq.sortBy(v => (v._2, v._1))
    sorted.sliding(2).foreach { case Seq(p, n) =>
      assert(n._2 == p._2 + p._1, s"gap between $p and $n")
    case _ => () }
    // partitioning must not move a single offset
    val re = Sampling.concatPack(docs.repartition(7), "doc_id", col("nt"), 8L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(re == got)
  }
}
