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

  test("frameSample: strided frames tile the payload; lengths from real slices") {
    val f = Multimodal.frameSample(mm, frameBytes = 100, stride = 2).collect()
    assert(f.nonEmpty)
    // every sampled index is stride-aligned and offsets are consistent
    assert(f.forall(r => r.getLong(1) % 2 == 0 && r.getLong(2) == r.getLong(1) * 100))
    // all frames full-size except possibly the trailing one per doc
    val byDoc = f.groupBy(_.getLong(0))
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.init.forall(_.getLong(3) == 100L))
      assert(sorted.last.getLong(3) > 0 && sorted.last.getLong(3) <= 100L)
    }
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
