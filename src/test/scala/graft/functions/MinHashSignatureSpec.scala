package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftFunctions, TestSpark}

/** Native codegen'd minhash_sig vs the declarative fold: identical output
  * (same constant family), codegen path taken. */
class MinHashSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native minhash_sig == declarative minhashSignature on documents") {
    GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, TestSpark.sfDir).limit(100)
      .withColumn("__h0", Dedup.shingleHashes($"text"))
    val both = docs.select(
      call_function("minhash_sig", $"__h0").as("native"),
      Dedup.minhashSignature($"__h0").as("decl"))
    val diff = both.filter($"native" =!= $"decl").count()
    assert(diff == 0)
  }

  test("expression runs inside WholeStageCodegen over a plain array column") {
    // note: composed directly with higher-order-function inputs the whole
    // Project falls back (HOFs are CodegenFallback) — the expression still
    // wins there because its 64×n loop is one compiled eval call, not an
    // expression-tree walk per element
    GraftFunctions.register(spark)
    val df = graft.Tables.embeddings(spark, TestSpark.sfDir).limit(20)
      .select(array($"vec_id", $"vec_id" * 7, $"vec_id" * 31).as("h0"))
      .select(call_function("minhash_sig", $"h0").as("s"))
    val covered = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("minhash_sig")
      case _ => false
    }
    assert(covered, df.queryExecution.executedPlan.toString())
    assert(df.collect().forall(_.getSeq[Long](0).length == 64))
  }
}
