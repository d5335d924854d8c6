package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * kernels.
  *
  * The DECODE KERNELS ARE STUBS — this container has no image/audio
  * libraries, so `decodeImageStub` / `featureStub` compute a
  * deterministic fake from the byte payload (which also makes them
  * oracle-checkable). Everything around them is the real thing and is
  * what matters at scale:
  *   - rows flow `Dataset[(id, bytes)] → mapPartitions → grouped(batch)`
  *     — the executor-side batch boundary where a vectorized decoder,
  *     native library, or GPU kernel takes over (the JVM-side equivalent
  *     of `mapInPandas` batches);
  *   - output schemas are typed case classes, so downstream is ordinary
  *     columnar Spark;
  *   - frame sampling is pure codegen'd SQL over the binary payload
  *     (substring on BinaryType), no kernel needed.
  *
  * To productionize: replace the two stub bodies with real decoders;
  * signatures, batching, and schemas stay as-is.
  */
object Multimodal {

  /** Rows per decode batch — sized for decoder/accelerator hand-off,
    * not Spark semantics.
    */
  val DecodeBatchSize = 64

  case class ImageMeta(id: Long, width: Int, height: Int, channels: Int)
  case class MediaFeatures(id: Long, features: Array[Float])

  /** STUB decode — deterministic dims from payload length. */
  private def decodeImageStub(bytes: Array[Byte]): (Int, Int, Int) =
    (1 + bytes.length % 640, 1 + bytes.length % 480, 3)

  /** STUB feature extractor — f_j = ((len·(j+1)) mod 97) / 97. */
  private def featureStub(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(j => ((bytes.length.toLong * (j + 1)) % 97).toFloat / 97.0f)

  /** Media table derived from `documents`: the text bytes stand in for
    * an encoded image/video payload (`media_type` tagged by caller).
    */
  def mediaFromDocuments(docs: DataFrame, mediaType: String): DataFrame =
    docs.select(col("doc_id").as("id"),
      lit(mediaType).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** Batched image decode → typed metadata. */
  def imageMeta(media: DataFrame): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        // batch boundary: a real decoder processes `batch` vectorized
        batch.map { case (id, bytes) =>
          val (w, h, c) = decodeImageStub(bytes)
          ImageMeta(id, w, h, c)
        }
      })
  }

  /** Batched feature extraction → fixed-dim float vector per row. */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { case (id, bytes) => MediaFeatures(id, featureStub(bytes, dim)) }
      })
  }

  /** Resize plan step: pure metadata transform (a real resize would be
    * another batched kernel over content + meta).
    */
  def clampMeta(meta: Dataset[ImageMeta], maxW: Int, maxH: Int): DataFrame =
    meta.toDF().select(col("id"),
      least(col("width"), lit(maxW)).as("width"),
      least(col("height"), lit(maxH)).as("height"),
      col("channels"))

  /** Frame sampling: split the payload into `n` equal byte slices —
    * codegen'd binary ops only (substring on BinaryType), one narrow
    * stage. Output: (id, frame_idx, frame bytes).
    */
  def frameSample(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("flen", expr(s"(octet_length(content) + ${n - 1}) div $n"))
      .select(col("id"),
        posexplode(expr(
          s"transform(sequence(0, ${n - 1}), i -> substring(content, i * flen + 1, flen))"))
          .as(Seq("frame_idx", "frame")))
      .filter(octet_length(col("frame")) > 0)
}
