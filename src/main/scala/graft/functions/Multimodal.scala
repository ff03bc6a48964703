package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, processed batch-at-a-time through
  * `mapPartitions` (the Scala analog of Arrow-batched pandas UDFs).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * `stubDecode` derives deterministic fake features from the bytes (clearly
  * marked below). Everything around it is the real engine surface a 100 TB
  * multimodal pipeline needs: schema (binary + struct metadata), partition
  * sizing so a batch of payloads fits executor memory, and a typed
  * batch-iterator boundary where a real decoder (JNI/FFI) would slot in.
  */
object Multimodal {

  /** Metadata carried next to every payload (the typed side of the column). */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a documents table into a multimodal shape: payload = utf-8 bytes
    * of `text` standing in for an encoded image, metadata derived
    * deterministically. Real pipelines land this shape directly from
    * ingestion; fake dims come from the payload hash. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        octet_length(col("text")).cast("long").as("byte_len"),
        (pmod(xxhash64(col("text")), lit(448)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(448)) + 64).cast("int").as("height"))
        .as("meta"))

  /** Feature row produced per payload by the (stub) decoder. Features are
    * scalar columns (f0..f7), not an array — downstream consumers (and the
    * oracle comparator) handle flat numeric columns; an array here buys
    * nothing and costs a per-row allocation. */
  val FeatureSchema: StructType = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)) ++
      (0 until 8).map(i => StructField(s"f$i", LongType)))

  /** ======================= STUB DECODER =======================
    * A real implementation decodes `payload` (JPEG/PNG/WAV...) and runs
    * feature extraction / resize / frame sampling here, batch-at-a-time.
    * This container has no codec libraries, so features are a deterministic
    * function of the raw bytes: an 8-bucket byte histogram (bucket =
    * byte >> 5) in parts-per-million, exact integer math so any engine can
    * reproduce it bit-for-bit. The mapPartitions boundary, schema, and batch
    * shape are the real thing. */
  def stubDecode(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 5) += 1; i += 1 }
    val n = math.max(bytes.length, 1)
    hist.map(h => h * 1000000L / n)
  }

  /** Decode + feature-extract over the multimodal table. Partition-parallel;
    * each task touches only its payload batch (no driver collect). At scale,
    * pair with `spark.sql.files.maxPartitionBytes` so payload batches fit
    * executor memory. */
  def extractFeatures(mm: DataFrame): DataFrame = {
    val spark = mm.sparkSession
    val rdd = mm.select("doc_id", "payload", "meta").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val meta = r.getStruct(2)
        val f = stubDecode(payload)
        Row.fromSeq(Seq[Any](id, meta.getLong(1), meta.getInt(2), meta.getInt(3)) ++ f)
      }
    }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** Output row per sampled frame: offsets/lengths are computed from the
    * ACTUAL sliced byte arrays, so the oracle checks the slicing code. */
  val FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_off", LongType),
    StructField("frame_len", LongType)))

  /** Frame sampling (the video-payload op): treat each payload as a
    * sequence of fixed-size frames, materialize every `stride`-th frame's
    * bytes batch-at-a-time, emit one row per sampled frame. The byte
    * slicing is real (a codec would decode the slice instead); the emitted
    * lengths come from the sliced arrays, making the plumbing
    * oracle-checkable with integer math. Explodes partition-parallel —
    * no driver involvement, output size = |payload bytes| / stride. */
  def frameSample(mm: DataFrame, frameBytes: Int = 4096, stride: Int = 4): DataFrame = {
    val spark = mm.sparkSession
    val rdd = mm.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { idx =>
          val off = idx * frameBytes
          val frame = java.util.Arrays.copyOfRange(
            payload, off, math.min(off + frameBytes, payload.length))
          Row(id, idx.toLong, off.toLong, frame.length.toLong)
        }
      }
    }
    spark.createDataFrame(rdd, FrameSchema)
  }

  /** Resize metadata transform (pure-column math on the typed side — no
    * decode needed to plan a resize). */
  def planResize(mm: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxDim).cast("double") / greatest(w, h))
    mm.withColumn("resize_w", ceil(w * scale).cast("int"))
      .withColumn("resize_h", ceil(h * scale).cast("int"))
  }
}
