package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftFunctions, TestSpark}

/** Product quantization over the int8-quantized domain (expr.PqEncode,
  * Similarity.pqEncode/pqTopK). The DuckDB oracle (s32/s33) is the
  * cross-engine check; this spec pins the Spark-side invariants. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, TestSpark.sfDir)

  test("pq_encode survives codegen; codes are valid indices") {
    GraftFunctions.register(spark)
    // a parquet-backed input (a literal one constant-folds the whole plan)
    val flat = (0 until 4 * 64).map(i => (i % 5).toLong) // 4 entries, dim 64
    val df = emb.limit(20).select(call_function("pq_encode",
      call_function("quantize127", $"embedding").getField("q"),
      typedlit(flat), lit(4)).as("codes"))
    val covered = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("pq_encode")
      case _ => false
    }
    assert(covered, df.queryExecution.executedPlan.toString())
    val codes = df.collect().map(_.getSeq[Long](0))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
  }

  test("identical vectors get identical codes; ids < nCodes self-assign exactly") {
    val codes = Similarity.pqEncode(emb, m = 4, nCodes = 64)
    // a codebook member's nearest entry in EVERY subspace is itself
    // (distance 0, and ties cannot beat it because order is (d, cid) with
    // itself at d=0 — unless an earlier cid duplicates the subvector,
    // which still yields d=0 and a deterministic smaller cid)
    val self = codes.filter(col("vec_id") < 64)
      .filter(col("code") === col("vec_id")).count()
    assert(self >= 64 * 4 - 64, s"most codebook subvectors must self-assign, got $self")
    assert(codes.count() == emb.count() * 4)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 4).isEmpty)
  }

  test("pqTopK recall vs exact quantized brute force is nontrivial and deterministic") {
    val queries = emb.filter(col("vec_id") < 5)
    val pq = Similarity.pqTopK(emb, queries, k = 10)
    val exact = Similarity.quantizedBruteTopK(emb, queries, k = 10)
    val pqMap = pq.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exMap = exact.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exMap.map { case (q, ex) =>
      (pqMap.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    // 4×16-dim subspaces, 64-entry sampled codebook, near-isotropic
    // synthetic vectors: a coarse quantizer. The bar asserts "ADC ranking
    // carries real signal", not production recall (raise m/nCodes for that).
    assert(mean >= 0.15, s"mean PQ recall@10 $mean — ADC ranking lost all signal")
    // determinism: a second run returns the identical result set
    val again = Similarity.pqTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == pq.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
