package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads as opaque `binary` columns with typed metadata, processed
  * per-partition in batches (the Scala analogue of `mapInPandas` — one
  * iterator pass per partition, no per-row serialization overhead).
  *
  * The container has no image/audio codecs, so the decode kernels are
  * STUBBED with clearly-marked deterministic fakes (`fakeDecode*`): the
  * Spark-side contract — schema, partitioning, batch iteration, output
  * shape — is real and tested; swapping the kernel body for a JNI/FFI
  * decoder changes no plumbing.
  */
object Multimodal {

  /** Typed media row: payload + metadata travelling together. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 features: Array[Float])

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))

  /** STUB decode kernel: a real build links an image codec here. The fake
    * is deterministic in the payload bytes so tests are stable. */
  private[multimodal] def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** STUB frame hash: a real build decodes the container and hashes pixels. */
  private[multimodal] def fakeFrameHash(payload: Array[Byte], frameIdx: Int): Long = {
    var h = 0xcbf29ce484222325L ^ frameIdx.toLong
    var i = frameIdx % math.max(payload.length, 1)
    var n = 0
    while (n < 64 && payload.length > 0) {
      h = (h ^ (payload(i) & 0xff)) * 0x100000001b3L
      i = (i + 7) % payload.length
      n += 1
    }
    h
  }

  /** Feature extraction: batched per-partition pass over binary payloads.
    * Output is an embedding-like column ready for the similarity operators
    * in [[graft.ops.Embeddings]]. */
  def extractImageFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        ImageFeatures(r.media_id, r.width, r.height, fakeDecodeFeatures(r.payload, dim))
      }
    }
  }

  /** Frame sampling: every `stride`-th frame up to `maxFrames` per video. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 10, maxFrames: Int = 8): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until maxFrames).iterator.map(k => FrameSample(r.media_id, k * stride, fakeFrameHash(r.payload, k * stride)))
    }
  }

  /** Resize metadata transform (pure plumbing: the pixel op is the stub). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(width = w, height = h,
      payload = fakeResize(r.payload, w, h)))
  }

  /** STUB pixel resample — deterministic truncation/padding stand-in. */
  private[multimodal] def fakeResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, math.min(payload.length, w * h / 64))
    java.util.Arrays.copyOf(payload, target)
  }

  /** Deterministic synthetic media table for tests/demos (no codecs in the
    * container; payload bytes are seeded by media_id). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rng = new scala.util.Random(i)
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val payload = new Array[Byte](256 + (i % 64).toInt)
      rng.nextBytes(payload)
      MediaRow(i, kind, payload, 640, 480, 16000)
    }
  }

  /** Gate query: the full multimodal flow — synthetic media → batched
    * feature extraction → frame sampling — rolled up per kind. Rows-only
    * check (the decode kernels are container-stub functions, not ANSI
    * SQL), but the output is fully deterministic and partitioning-
    * independent: feature norms are rounded then decimal-summed, frame
    * hashes are xor-folded, so the driver's byte-determinism check holds.
    * The `sfDir` argument is unused (media is synthesized — the parquet
    * fixtures carry no binary payload column); scale comes from the same
    * per-partition batch kernels a real corpus would run. */
  def qMultimodalSummary(s: SparkSession, dir: String): DataFrame = {
    val media = syntheticMedia(s, 300)
    val feats = extractImageFeatures(media, dim = 64).toDF()
      .select(col("media_id"), col("features"))
    graft.functions.GraftFunctions.register(s)
    val kinds = media.toDF().select(col("media_id"), col("kind"))
    val norms = feats
      .withColumn("nrm", round(sqrt(expr("graft_dot(features, features)")), 6))
    val frames = sampleFrames(media, stride = 10, maxFrames = 4).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
           expr("bit_xor(frame_hash)").as("frame_sig"))
    kinds.join(norms, "media_id")
      .join(frames, Seq("media_id"), "left")
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("nrm").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_norm"),
        sum(coalesce(col("n_frames"), lit(0L))).cast(LongType).as("n_frames"),
        expr("bit_xor(coalesce(frame_sig, CAST(0 AS BIGINT)))").as("kind_sig"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_multimodal_summary" -> (qMultimodalSummary _),
  )
}
