package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary-column operators (scale extension, SURVEY §7.2 M8):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, processed in Arrow-friendly batches.
  *
  * The reference's model stages consume image crops
  * (reference src/embedding.py:1263-1387); in-engine the contract is
  * columnar: `binaryFile` scan → per-partition batched decode/featurize →
  * feature columns. The DECODE STEP IS A DETERMINISTIC STUB (no image
  * codecs in this container — clearly marked below); the Spark-side
  * plumbing — schema, partition-batched iteration, batch shape — is real.
  *
  * Scale: `spark.read.format("binaryFile")` is a splittable listing scan;
  * per-partition batching (`grouped(batchSize)`) mirrors the reference's
  * DataLoader batch=32 (src/embedding.py:1361-1362) and is the shape
  * `mapInArrow`/Pandas-UDF batching takes on a real cluster.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modality", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType),
    StructField("meta_duration_ms", LongType)
  ))

  /** Directory of media files → media table (S10 analogue;
    * reference ext-sniffing at src/utils/helpers.py:665-685).
    */
  def readMediaDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
      .select(col("path"),
        when(col("path").rlike("(?i)\\.(jpg|jpeg|png)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac)$"), "audio")
          .otherwise("video").as("modality"),
        col("content"),
        lit(null).cast(IntegerType).as("meta_width"),
        lit(null).cast(IntegerType).as("meta_height"),
        lit(null).cast(LongType).as("meta_duration_ms"))

  /** STUB DECODE — deterministic fake: "decodes" a binary payload to a
    * fixed-length feature vector derived from content bytes. A real
    * deployment swaps ONLY the body of `decodeOne` for an image-codec /
    * model call; the batching, schema, and partitioning stay as-is.
    */
  def decodeOne(content: Array[Byte], dim: Int): Array[Float] = {
    val out = Array.ofDim[Float](dim)
    if (content != null && content.nonEmpty) {
      var i = 0
      while (i < dim) {
        // deterministic byte-fold; stands in for pixel decode + model
        out(i) = ((content(i % content.length) & 0xff) * 31 + i) % 256 / 255.0f
        i += 1
      }
    }
    out
  }

  final case class MediaFeature(path: String, modality: String, feature: Array[Float])

  /** Batched featurize: per-partition, batches of `batchSize` rows go
    * through the (stub) decoder together — the real UDF-batch shape.
    */
  def featurize(media: DataFrame, dim: Int = 64, batchSize: Int = 32): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("path", "modality", "content").as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch-shaped call boundary: a real impl hands `batch` to the
          // model runtime in one go (GPU batching, reference P7)
          batch.map { case (p, m, c) => MediaFeature(p, m, decodeOne(c, dim)) }
        }
      }
  }

  /** Frame-sample stub for video payloads: emit every `stride`-th
    * "frame" as a (path, frameIdx, feature) row — the explode shape of
    * per-frame extraction with a byte-offset fake.
    */
  final case class FrameFeature(path: String, frameIdx: Int, feature: Array[Float])

  def sampleFrames(media: DataFrame, nFrames: Int, dim: Int = 16): Dataset[FrameFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, c) =>
        (0 until nFrames).map { f =>
          val slice = if (c == null || c.isEmpty) Array.emptyByteArray
            else c.drop(f * math.max(1, c.length / math.max(nFrames, 1))).take(64)
          FrameFeature(p, f, decodeOne(slice, dim))
        }
      }
  }
}
