package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted per-blob metadata. `width`/`height`/`channels` come from the
  * (stubbed) decoder; `nBytes`/`checksum` are real.
  */
final case class MediaMeta(doc_id: Long, n_bytes: Long, fake_width: Long,
    fake_height: Long, channels: Int, checksum: Long)

/** Multimodal column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus a typed metadata struct. The Spark-side
  * mechanics — schema, batch shape, partition-parallel decode via
  * mapPartitions — are real; the actual media decode is STUBBED (no
  * image/audio codecs in this container) behind [[StubDecoder.decode]],
  * which derives deterministic fake dimensions from the bytes so tests are
  * reproducible.
  */
object StubDecoder {

  /** STUB: a real deployment would decode the media container here (JPEG /
    * WAV / MP4 header parse + frame decode). Deterministic fake: dimensions
    * derived from blob length, checksum is a real FNV-1a over the bytes.
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
    * so a real decoder could amortize codec/context setup per batch — the
    * same batch shape a Pandas-UDF/mapInPandas decode would use.
    */
  def extractMeta(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => StubDecoder.decode(id, bytes) })
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
