package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches. The Spark-side shape —
  * schema, partitioning, per-partition batched processing, output schema —
  * is real and tested; the actual media DECODE IS A STUB (deterministic
  * fake derived from the bytes) because no image/audio codec library ships
  * in this environment. Swap `stubDecode*` for a real codec call and
  * nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("frames", ArrayType(ArrayType(FloatType, containsNull = false),
      containsNull = false), nullable = false)))

  /** Build a media table from any (id, text) source — payload is the UTF-8
    * bytes; stands in for real image/audio blobs with identical plumbing.
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("synthetic").as("source"),
        length(col(textCol)).cast("long").as("declared_bytes")).as("meta"))

  // ====================== STUB DECODERS ======================
  // Deterministic fakes: "decode" metadata and features from a hash of the
  // payload bytes. Replace with javax.imageio / a codec binding in a real
  // deployment — signatures and batch shape are the contract.

  private def bytesHash(b: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < b.length) { h = 31 * h + b(i); i += 1 }
    h
  }

  private def stubDecodeImage(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val h = bytesHash(payload)
    val width = 64 + math.abs(h % 1857).toInt        // 64..1920
    val height = 64 + math.abs((h >> 13) % 1017).toInt
    val channels = 3
    val feature = Array.tabulate(16)(i =>
      (((h >> (i * 3)) & 0xFF) / 255.0f) * 2.0f - 1.0f)
    (width, height, channels, feature)
  }

  private def stubDecodeAudio(payload: Array[Byte]): (Int, Long, Array[Array[Float]]) = {
    val h = bytesHash(payload)
    val rate = 16000
    val nSamples = 1000L + math.abs(h % 64000L)
    val nFrames = 4
    val frames = Array.tabulate(nFrames)(f =>
      Array.tabulate(8)(i => (((h >> ((f * 8 + i) % 56)) & 0x7F) / 127.0f)))
    (rate, nSamples, frames)
  }

  /** Image decode + feature extraction, batched per partition. Repartition
    * by media_id first so decode work spreads evenly regardless of input
    * file layout (media blobs skew hard in practice).
    */
  def imageFeatures(media: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val rdd = src
      .select(col("media_id"), col("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val (w, h, c, feat) = stubDecodeImage(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), w, h, c, feat.toSeq)
        }
      }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }

  /** Audio decode + fixed-count frame sampling, batched per partition. */
  def audioFrames(media: DataFrame, partitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val rdd = src
      .select(col("media_id"), col("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val (rate, n, frames) = stubDecodeAudio(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), rate, n, frames.map(_.toSeq).toSeq)
        }
      }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  /** Deterministic "resize": project the stub feature to a smaller grid —
    * stands in for image resize keeping the distributed shape intact.
    */
  def resizeFeatures(features: DataFrame, newDim: Int): DataFrame =
    features.withColumn("feature",
      slice(col("feature"), 1, newDim))

  val videoFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("stride", IntegerType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  private def stubDecodeVideo(payload: Array[Byte]): (Int, Int) = {
    val h = bytesHash(payload)
    val nFrames = 30 + math.abs(h % 271).toInt // 30..300 ⇒ always ≥ k below
    (nFrames, 30)
  }

  /** Video decode + strided frame sampling: one input blob EXPLODES into
    * `k` frame rows (every ⌊n/k⌋-th frame, so samples span the whole
    * clip) — the flatMap shape at the codec boundary, vs the 1:1 map of
    * [[imageFeatures]]/[[audioFrames]]. Row count and timestamps are
    * pure arithmetic over the decoded frame count (ts = idx·1000/fps),
    * so the pipeline contract stays oracle-checkable even though the
    * decode itself is the documented stub. Repartition by media_id
    * before decoding: video blobs skew hardest of all media, and the
    * explosion multiplies whatever skew survives the scan.
    */
  def videoFrames(media: DataFrame, k: Int = 8, partitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    val rdd = src
      .select(col("media_id"), col("payload"))
      .rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (nFrames, fps) = stubDecodeVideo(payload)
          val stride = math.max(1, nFrames / k)
          val h = bytesHash(payload)
          (0 until math.min(k, nFrames)).iterator.map { i =>
            val idx = i * stride
            val feature = Array.tabulate(12)(j =>
              (((h >> ((idx + j * 5) % 56)) & 0xFF) / 255.0f) * 2.0f - 1.0f)
            Row(r.getLong(0), nFrames, fps, stride, idx,
              idx.toLong * 1000L / fps, feature.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, videoFrameSchema)
  }
}
