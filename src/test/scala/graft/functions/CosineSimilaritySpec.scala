package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftFunctions, TestSpark}

/** Native codegen'd cosine expression vs the declarative zip_with form:
  * identical values, SQL registration, codegen path actually taken. */
class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native == declarative to 1e-12 on real embeddings") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, TestSpark.sfDir).limit(50)
    val a = emb.select($"vec_id", $"embedding".as("va"))
    val b = emb.select($"vec_id".as("vid2"), $"embedding".as("vb"))
    val pairs = a.join(b, $"vec_id" < $"vid2")
      .select(
        call_function("cosine_sim", $"va", $"vb").as("native"),
        Similarity.cosine($"va", $"vb").as("decl"))
    val maxDiff = pairs.agg(max(abs($"native" - $"decl"))).head().getDouble(0)
    assert(maxDiff < 1e-12, s"max diff $maxDiff")
  }

  test("SQL surface: cosine_sim callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    graft.Tables.embeddings(spark, TestSpark.sfDir).limit(5)
      .createOrReplaceTempView("emb_cs_test")
    val n = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_cs_test a JOIN emb_cs_test b ON a.vec_id < b.vec_id""".stripMargin)
      .filter($"c".between(-1.000001, 1.000001)).count()
    assert(n == 10)
  }

  test("expression survives codegen (no fallback to interpreted)") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, TestSpark.sfDir).limit(10)
    val df = emb.select(call_function("cosine_sim", $"embedding", $"embedding").as("c"))
    // WholeStageCodegen span must cover the Project containing our expression
    // (rendered as the `*(n)` prefix in plan strings)
    val covered = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("cosine_sim")
      case _ => false
    }
    assert(covered, df.queryExecution.executedPlan.toString())
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
