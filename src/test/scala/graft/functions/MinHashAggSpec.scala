package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftFunctions, TestSpark}

/** MinHash set-union aggregate: group signatures equal the signature of the
  * union, partial aggregation applies, and group-level Jaccard estimates
  * track truth. */
class MinHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sigs(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("__h0", Dedup.shingleHashes($"text"))
    .withColumn("sig", Dedup.minhashSignature($"__h0"))

  test("minhash_agg == elementwise min of member signatures (union property)") {
    GraftFunctions.register(spark)
    val docs = Seq(
      ("g1", "alpha beta gamma delta epsilon zeta eta theta"),
      ("g1", "iota kappa lambda mu nu xi omicron pi"),
      ("g2", "rho sigma tau upsilon phi chi psi omega")).toDF("g", "text")
    val withSig = sigs(docs).cache()
    val agg = withSig.groupBy("g")
      .agg(call_function("minhash_agg", $"sig").as("gsig"))
    val g1Agg = agg.filter($"g" === "g1").head().getSeq[Long](1)
    // sig(A ∪ B) = elementwise min(sig(A), sig(B)) — the MinHash identity
    val members = withSig.filter($"g" === "g1").collect()
      .map(r => r.getSeq[Long](r.fieldIndex("sig")))
    val expected = members.reduce((x, y) => x.zip(y).map { case (p, q) => math.min(p, q) })
    assert(g1Agg == expected)
    withSig.unpersist()
  }

  test("optional width arg: minhash_agg(sig, 16) unions a 16-wide md5 family") {
    GraftFunctions.register(spark)
    val docs = Seq(
      ("g1", "alpha beta gamma delta epsilon zeta eta theta"),
      ("g1", "iota kappa lambda mu nu xi omicron pi")).toDF("g", "text")
    val withSig = docs
      .withColumn("sig", call_function("minhash_md5", $"text", lit(16))).cache()
    val agg = withSig.groupBy("g")
      .agg(call_function("minhash_agg", $"sig", lit(16)).as("gsig"))
      .head().getSeq[Long](1)
    val members = withSig.collect().map(r => r.getSeq[Long](r.fieldIndex("sig")))
    val expected = members.reduce((x, y) => x.zip(y).map { case (p, q) => math.min(p, q) })
    assert(agg.size == 16 && agg == expected)
    withSig.unpersist()
  }

  test("group-level Jaccard: same source docs more similar than disjoint") {
    GraftFunctions.register(spark)
    val a = "spark shuffles data across partitions while catalyst optimizes plans"
    val docs = Seq(
      ("s1", a), ("s1", a + " and tungsten generates code"),
      ("s2", a), ("s2", a + " with vectorized parquet readers"),
      ("s3", "cooking pasta with garlic basil and olive oil in salted water"))
      .toDF("g", "text")
    val agg = sigs(docs).groupBy("g")
      .agg(call_function("minhash_agg", $"sig").as("gsig")).cache()
    def est(x: String, y: String): Double = {
      val sa = agg.filter($"g" === x).select($"gsig").head().getSeq[Long](0)
      val sb = agg.filter($"g" === y).select($"gsig").head().getSeq[Long](0)
      sa.zip(sb).count { case (p, q) => p == q }.toDouble / sa.size
    }
    assert(est("s1", "s2") > 0.35)  // overlapping corpora (true J ≈ 0.45)
    assert(est("s1", "s3") < 0.2)   // disjoint corpora
    agg.unpersist()
  }

  test("partial aggregation survives repartitioning (merge path exercised)") {
    GraftFunctions.register(spark)
    val docs = (1 to 100).map(i => ("g", s"tok$i tok${i + 1} tok${i + 2} tok${i + 3}"))
      .toDF("g", "text")
    val one = sigs(docs).repartition(1).groupBy("g")
      .agg(call_function("minhash_agg", $"sig")).head().getSeq[Long](1)
    val many = sigs(docs).repartition(7).groupBy("g")
      .agg(call_function("minhash_agg", $"sig")).head().getSeq[Long](1)
    assert(one == many)
  }
}
