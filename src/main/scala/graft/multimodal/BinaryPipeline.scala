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

object BinaryPipeline {

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
}
