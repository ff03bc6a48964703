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

  test("binaryNearDup: identical payloads pair at hamming 0; unrelated bytes do not pair") {
    // controlled corpus through the SAME pipeline the m3 entry runs:
    // 1/2 identical; 3 appends one byte, which lands in the DROPPED
    // partial window (len(base) % 4 == 0) so its window stream — and
    // signature — is identical; 4 is unrelated bytes
    val base = "the quick brown fox jumps over the lazy dog " * 8
    assert(base.length % 4 == 0)
    val docs = Seq(
      (1L, base), (2L, base), (3L, base + "!"),
      (4L, new scala.util.Random(7).alphanumeric.take(base.length).mkString))
      .toDF("doc_id", "text")
    val mmc = Multimodal.attachBinary(docs)
    val hexp = hex(col("payload"))
    val nwin = (col("meta.byte_len") / lit(4)).cast("int")
    val toks = concat_ws(" ", transform(sequence(lit(0), nwin - lit(1)),
      i => hexp.substr(i * lit(8) + lit(1), lit(8))))
    val pairs = Dedup.simhashNearDup(
      mmc.select(col("doc_id"), toks.as("btok")), textCol = "btok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L),
      s"identical payloads must pair at hamming 0: $pairs")
    // the partial-window append has the identical window stream
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0L),
      s"a dropped-partial-window append must pair at hamming 0: $pairs")
    // unrelated random bytes never pair with anything
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated payloads must not pair: $pairs")
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
