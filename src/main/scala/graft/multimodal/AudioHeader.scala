package graft.multimodal

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** WAV/RIFF audio-container header decode — the audio leg of the
  * multimodal metadata path (images: [[MediaHeader]]/[[PixelCodec]]).
  * Format per the public Microsoft/IBM RIFF WAVE spec (also ITU-hosted):
  * a `RIFF` outer chunk typed `WAVE`, then a chunk WALK — `fmt ` carries
  * (audio_format, channels, sample_rate, bits_per_sample) as
  * little-endian integers, `data` carries the sample payload whose byte
  * length over the frame stride gives the frame count and duration.
  * Chunks are word-aligned: an odd-sized chunk is followed by a pad
  * byte, and a reader that forgets the pad desyncs on every file with
  * an odd-length LIST/INFO block — the walk here pads, and the fixture
  * plants an odd-sized LIST chunk to prove it.
  *
  * Decode posture (the [[PixelCodec]] discipline): torn, truncated,
  * non-RIFF, non-WAVE, or stride-inconsistent bytes yield NULL, never a
  * throw; a declared `data` size that overruns the buffer is torn (this
  * reader audits real bytes, it does not trust declarations). Pure JVM
  * kernel via StaticInvoke — whole-stage codegen, no UDF.
  */
object AudioHeader {

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

  /** [audio_format, channels, sample_rate, bits_per_sample, n_frames,
    * duration_ms] or NULL when the bytes are not a parseable WAV.
    */
  def wavMeta(b: Array[Byte]): ArrayData = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
    var off = 12
    var fmtCode = -1; var ch = -1; var sr = -1L; var bits = -1
    var dataSize = -1L
    while (off + 8 <= b.length && (fmtCode < 0 || dataSize < 0)) {
      val id = tag(b, off)
      val sz = u32le(b, off + 4)
      val body = off + 8
      if (body + sz > b.length) return null // declared size overruns: torn
      if (id == "fmt ") {
        if (sz < 16) return null
        fmtCode = u16le(b, body)
        ch = u16le(b, body + 2)
        sr = u32le(b, body + 4)
        bits = u16le(b, body + 14)
      } else if (id == "data") {
        dataSize = sz
      }
      off = body + sz.toInt + (sz.toInt & 1) // word-align: odd sizes pad
    }
    if (fmtCode < 0 || dataSize < 0) return null
    val stride = ch.toLong * bits / 8
    if (ch <= 0 || sr <= 0 || bits <= 0 || bits % 8 != 0 ||
      dataSize % stride != 0) return null
    val frames = dataSize / stride
    new GenericArrayData(Array(fmtCode.toLong, ch.toLong, sr, bits.toLong,
      frames, frames * 1000L / sr))
  }

  /** Deterministic per-doc WAV fixture (the q95/q123 plant pattern):
    * parameters are pure doc_id arithmetic the oracle recomputes, while
    * the Spark side must genuinely walk the container it assembled.
    * Variants by id mod 11: 7 = torn mid-header, 9 = not RIFF, 10 =
    * RIFF but not WAVE (an AVI) — all NULL; 8 = IEEE-float format code
    * 3 at 32 bits; everything else PCM. Ids ≡ 1 mod 4 get an odd-sized
    * LIST chunk between fmt and data (the pad-byte corner).
    */
  def makeWav(docId: Long): Array[Byte] = {
    val v = (docId % 11).toInt
    if (v == 9) return "JUNKJUNKJUNKJUNK".getBytes("US-ASCII")
    val ch = 1 + (docId % 2).toInt
    val float32 = v == 8
    val fmtCode = if (float32) 3 else 1
    val bits = if (float32) 32 else if (docId % 3 == 0) 8 else 16
    val sr = 8000 + (docId % 5).toInt * 2000
    val frames = 1 + (docId % 50).toInt
    val stride = ch * bits / 8
    val dataSize = frames * stride
    val list = if (docId % 4 == 1) 8 + 5 + 1 else 0 // odd LIST + pad
    val riffSize = 4 + 24 + list + 8 + dataSize
    val out = new java.io.ByteArrayOutputStream
    def w16(x: Int): Unit = { out.write(x & 0xff); out.write((x >> 8) & 0xff) }
    def w32(x: Long): Unit = { var i = 0; while (i < 4) {
      out.write(((x >> (8 * i)) & 0xff).toInt); i += 1 } }
    out.write("RIFF".getBytes("US-ASCII")); w32(riffSize)
    out.write((if (v == 10) "AVI " else "WAVE").getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(fmtCode); w16(ch); w32(sr); w32(sr.toLong * stride)
    w16(stride); w16(bits)
    if (list > 0) {
      out.write("LIST".getBytes("US-ASCII")); w32(5)
      out.write("INFO!".getBytes("US-ASCII")); out.write(0) // pad byte
    }
    out.write("data".getBytes("US-ASCII")); w32(dataSize)
    out.write(new Array[Byte](dataSize))
    val full = out.toByteArray
    if (v == 7) java.util.Arrays.copyOf(full, 18) else full
  }
}
