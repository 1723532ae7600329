package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * payloads ride as opaque `binary` columns next to a typed metadata struct;
 * decode / feature-extraction runs per-partition in bounded batches so a
 * real decoder (JNI / subprocess / native lib) drops in without changing
 * the plan shape.
 *
 * The actual codec is STUBBED — this container has no image/audio
 * libraries — with a deterministic fake (see [[fakeDecode]]) so the
 * Spark-side contract (schema, batch shape, partitioning, null handling)
 * is real and testable end-to-end. Swap `fakeDecode` for the real decoder
 * at deployment; everything else stays.
 */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false)))

  /**
   * Wrap a text table into a multimodal layout: payload = utf-8 bytes of
   * the text (a stand-in for real media bytes), metadata derived from the
   * payload. Pure column expressions — this is the ingest contract, not
   * the stub.
   */
  def asMultimodal(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image").as("modality"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"),
        abs(xxhash64(encode(col(textCol), "UTF-8"))).as("content_hash")).as("meta"))

  /** Decoded-feature row produced per payload. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /**
   * STUB decoder: a deterministic fake standing in for e.g. libjpeg /
   * ffmpeg. Derives pseudo width/height/frame-count from payload length
   * and a mean "intensity" from the raw bytes — cheap, deterministic, and
   * shaped exactly like a real decode result.
   */
  def fakeDecode(docId: Long, payload: Array[Byte]): Row = {
    val len = payload.length
    val width = 16 + (len % 64)
    val height = 16 + ((len / 64) % 64)
    val frames = 1 + (len % 8)
    val mean = if (len == 0) 0.0
      else payload.iterator.map(b => (b & 0xff).toDouble).sum / len
    // floor(x*1e6+0.5)/1e6, not rint: half-up reproduces in the SQL oracle
    Row(docId, width, height, frames, math.floor(mean * 1e6 + 0.5) / 1e6)
  }

  /**
   * Per-partition batched decode: iterates the partition in `batchSize`
   * groups (the shape a vectorized/native decoder wants), preserving
   * laziness — no partition is materialized whole. Repartitions to
   * `parallelism` so decode cost spreads evenly even when the upstream
   * partitioning was size-skewed (media blobs usually are).
   */
  def decodeFeatures(mm: DataFrame, parallelism: Int = 0,
                     batchSize: Int = 64): DataFrame = {
    val spark = mm.sparkSession
    val in = if (parallelism > 0) mm.repartition(parallelism, col("doc_id")) else mm
    val rdd = in.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would process `batch` in one native call
        batch.iterator.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  /** Resize contract: aspect-preserving fit of (width, height) into a
   * (maxW, maxH) box, never upscaling — the dimension arithmetic every
   * image pipeline runs before the actual pixel resample (which belongs in
   * the decode batch, next to the codec). Pure column math. */
  def resizeDims(features: DataFrame, maxW: Int = 32, maxH: Int = 32): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    features.select(col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("out_width"),
      floor(col("height") * scale).cast("int").as("out_height"))
  }

  /** Frame sampling contract: every `stride`-th frame index up to n_frames
   * (columnar; a real pipeline would fetch those frames in the decode
   * batch). */
  def sampleFrames(features: DataFrame, stride: Int = 2): DataFrame =
    features.select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /**
   * Fixed-window payload chunking — audio-style segmentation for training:
   * each payload splits into `chunkBytes`-sized binary chunks (last chunk
   * ragged), emitted as (doc_id, chunk_idx, chunk, chunk_len). Pure
   * column expressions (sequence + substring on binary), fully
   * distributed and codegen-friendly; a waveform pipeline would decode
   * each chunk in the [[decodeFeatures]] batch afterwards. Chunk count is
   * ceil(byte_len / chunkBytes); empty payloads produce no chunks.
   */
  def chunkPayload(mm: DataFrame, chunkBytes: Int = 256): DataFrame = {
    require(chunkBytes > 0)
    val n = ceil(col("meta.byte_len").cast("double") / chunkBytes).cast("int")
    mm.filter(col("meta.byte_len") > 0) // sequence(0, -1) would descend
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), n - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substring(payload, chunk_idx * $chunkBytes + 1, $chunkBytes)").as("chunk"))
      .withColumn("chunk_len", octet_length(col("chunk")).cast("long"))
  }
}
