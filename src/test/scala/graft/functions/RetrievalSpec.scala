package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** BM25 retrieval (Retrieval.bm25TopK) — ranking sanity plus the
  * partitioning-invariance the fixed-point accumulation buys. Cross-engine
  * exactness is pinned by oracle entry t16. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, TestSpark.sfDir)

  test("distinctive documents rank first for their own text as query") {
    // controlled corpus: three topically-distinct docs + common-vocab
    // filler. (The sf testdata corpus is deliberately near-duplicated, so
    // self-retrieval-at-1 is NOT a valid property there — a shorter
    // near-dup legitimately outscores the original under length
    // normalization.)
    val distinct = Seq(
      (1L, "quantum flux capacitor resonance cascade"),
      (2L, "banana smoothie recipe blender frozen"),
      (3L, "catalyst optimizer pushes filters into scans"))
    val filler = (10L until 40L).map(i => (i, s"the quick brown fox jumps over dog $i"))
    val corpus = (distinct ++ filler).toDF("doc_id", "text")
    val queries = distinct.toDF("query_id", "qtext")
    val top = Retrieval.bm25TopK(corpus, queries, k = 3)
    val first = top.filter($"rank" === 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(first == Map(1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"each distinctive doc must be its own top hit, got $first")
  }

  test("scores and ranks are invariant under repartitioning (fixed-point sums)") {
    val queries = docs.filter($"doc_id" < 2)
      .select($"doc_id".as("query_id"), $"text".as("qtext"))
    val a = Retrieval.bm25TopK(docs, queries, k = 10)
    val b = Retrieval.bm25TopK(docs.repartition(13, $"lang"), queries, k = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "BM25 output must be bit-identical under any input partitioning")
  }

  test("top-k is bounded and ranks are dense from 1") {
    val queries = docs.filter($"doc_id" < 3)
      .select($"doc_id".as("query_id"), $"text".as("qtext"))
    val top = Retrieval.bm25TopK(docs, queries, k = 10).cache()
    val perQ = top.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perQ.length == 3)
    perQ.foreach { case (q, n, lo, hi) =>
      assert(n <= 10 && lo == 1L && hi == n, s"query $q: n=$n lo=$lo hi=$hi")
    }
    top.unpersist()
  }
}
