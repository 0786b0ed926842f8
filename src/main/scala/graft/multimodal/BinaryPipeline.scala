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

  /** REAL frame sampler (the byte-slicing stub this used to be is
    * retired): genuinely decode the blob's APNG animation
    * ([[PixelCodec.decodeApngFrames]] — chunk walk, CRC-32 audit, one
    * zlib stream per frame, unfilter), keep every `every`-th frame up
    * to `maxFrames`, and emit each kept frame's flat R,G,B triples
    * with its ORIGINAL frame index. Undecodable or unsupported blobs
    * yield zero frames, never a throw (the q95 damage posture — at
    * 100 TB a poison clip must not kill the stage).
    */
  def sampleFrames(blob: Array[Byte], every: Int,
      maxFrames: Int): Seq[(Int, Array[Byte])] = {
    val frames = PixelCodec.decodeApngFrames(blob)
    if (frames == null) Seq.empty
    else (0 until frames.length by every).take(maxFrames).map { i =>
      val px = frames(i).px
      val out = new Array[Byte](px.length)
      var j = 0
      while (j < px.length) { out(j) = px(j).toByte; j += 1 }
      (i, out)
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
    * DECODED frames (row explosion bounded by maxFrames; frame_no keeps
    * the original animation index). Frames stay binary (flat RGB) —
    * downstream feature extraction (e.g. [[PHash]]) consumes them with
    * the same mapPartitions batch shape.
    */
  def extractFrames(spark: SparkSession, blobs: DataFrame, every: Int,
      maxFrames: Int): Dataset[FrameRow] = {
    import spark.implicits._
    blobs
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        sampleFrames(bytes, every, maxFrames).iterator
          .map { case (i, f) => FrameRow(id, i, f) }
      })
  }
}
