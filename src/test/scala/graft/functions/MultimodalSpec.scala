package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val mm = Multimodal.attachBinary(
    graft.Tables.documents(spark, TestSpark.sfDir))

  test("attachBinary: payload bytes round-trip, metadata consistent") {
    val r = mm.select($"doc_id", decode($"payload", "UTF-8").as("t"), $"meta.byte_len")
      .join(graft.Tables.documents(spark, TestSpark.sfDir), "doc_id")
      .filter($"t" =!= $"text" || $"byte_len" =!= length($"text").cast("long"))
    assert(r.isEmpty)
  }

  test("extractFeatures: deterministic, schema'd, histogram sums to ~1") {
    val f1 = Multimodal.extractFeatures(mm).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(mm).orderBy("doc_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.head.schema.fieldNames.toSeq ==
      Seq("doc_id", "byte_len", "width", "height") ++ (0 until 8).map(i => s"f$i"))
    val hist = (0 until 8).map(i => f1.head.getLong(f1.head.fieldIndex(s"f$i")))
    assert(math.abs(hist.sum - 1000000L) < 1000L)
  }

  test("planResize: caps the longer edge, preserves aspect direction") {
    val r = Multimodal.planResize(mm, maxDim = 128)
      .filter($"resize_w" > 128 || $"resize_h" > 128)
    assert(r.isEmpty)
    val upscaleNone = Multimodal.planResize(mm, maxDim = 4096)
      .filter($"resize_w" > $"meta.width")
    assert(upscaleNone.isEmpty)
  }
}
