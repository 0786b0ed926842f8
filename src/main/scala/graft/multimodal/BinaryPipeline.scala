package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted per-blob metadata. `nBytes`/`checksum` are real;
  * `fake_width`/`fake_height`/`channels` are the [[PayloadMeta]]
  * placeholders (image containers decode for real via [[PixelCodec]]).
  */
final case class MediaMeta(doc_id: Long, n_bytes: Long, fake_width: Long,
    fake_height: Long, channels: Int, checksum: Long)

/** Multimodal column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus a typed metadata struct. The Spark-side
  * mechanics — schema, batch shape, partition-parallel decode via
  * mapPartitions — are real, and so is the image decode path: container
  * headers parse via [[MediaHeader]] (q83) and pixel data decodes via
  * [[PixelCodec]] (q95, BMP BI_RGB + PNG truecolor incl. zlib inflate and
  * all five filters). [[PayloadMeta.derive]] below is the format-AGNOSTIC
  * metadata pass for blobs that are not a supported image container
  * (audio/video/arbitrary payloads): real n_bytes + FNV-1a checksum, plus
  * honestly-named `fake_*` placeholder dims derived from the length so the
  * schema matches the image path and tests stay reproducible.
  */
object PayloadMeta {

  /** Format-agnostic blob metadata: n_bytes and the FNV-1a checksum are
    * real; `fake_width`/`fake_height` are deterministic placeholders (a
    * supported image container would take the [[PixelCodec]] path instead).
    */
  def decode(docId: Long, blob: Array[Byte]): MediaMeta = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < blob.length) { h ^= (blob(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    MediaMeta(
      doc_id = docId,
      n_bytes = blob.length.toLong,
      fake_width = blob.length.toLong % 640L,
      fake_height = blob.length.toLong % 480L,
      channels = 3,
      checksum = h)
  }
}

final case class FrameRow(doc_id: Long, frame_no: Int, frame_bytes: Array[Byte])

object BinaryPipeline {

  /** STUB frame sampler: a real implementation parses the media container
    * and decodes every k-th frame; the deterministic fake slices the blob
    * into contiguous `frameSize`-byte windows from offset 0, at most
    * `maxFrames` of them (the last may be short). The Spark-side batch
    * shape — one blob in, a bounded frame list out, flatMap inside
    * mapPartitions — is exactly what a real decoder plugs into.
    */
  def sampleFrames(blob: Array[Byte], frameSize: Int,
      maxFrames: Int): Seq[Array[Byte]] = {
    val n = math.min(maxFrames.toLong,
      (blob.length.toLong + frameSize - 1) / frameSize).toInt
    (0 until n).map { i =>
      val from = i * frameSize
      java.util.Arrays.copyOfRange(blob, from,
        math.min(from + frameSize, blob.length))
    }
  }

  /** Attach a binary payload column (here: utf-8 bytes of a text column —
    * in production the bytes come off the source as-is).
    */
  def withBlob(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("blob"))

  /** Partition-parallel metadata extraction. mapPartitions (not per-row UDF)
    * so a decoder can amortize codec/context setup per batch — the same
    * batch shape a Pandas-UDF/mapInPandas decode would use. Image-container
    * blobs get real decode via F.pixelStats/[[PixelCodec]] (q95); this path
    * is the format-agnostic fallback.
    */
  def extractMeta(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => PayloadMeta.decode(id, bytes) })
  }

  /** Partition-parallel frame sampling: each blob fans out to its sampled
    * frames (row explosion bounded by maxFrames). Frames stay binary —
    * downstream feature extraction consumes them with the same
    * mapPartitions batch shape.
    */
  def extractFrames(spark: SparkSession, blobs: DataFrame, frameSize: Int,
      maxFrames: Int): Dataset[FrameRow] = {
    import spark.implicits._
    blobs
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        sampleFrames(bytes, frameSize, maxFrames).iterator.zipWithIndex
          .map { case (f, i) => FrameRow(id, i, f) }
      })
  }
}
