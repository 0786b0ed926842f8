package graft

import graft.multimodal.AudioHeader

/** WAV/RIFF header kernel corners (q129) — the oracle proves the fixture
  * round trip at corpus scale; these pin the chunk-walk spec corners on
  * hand-assembled bytes.
  */
class AudioHeaderSpec extends SparkSpec {

  private def meta(b: Array[Byte]): Option[Seq[Long]] =
    Option(AudioHeader.wavMeta(b)).map(_.toLongArray().toSeq)

  private def le16(x: Int) = Array[Byte]((x & 0xff).toByte,
    ((x >> 8) & 0xff).toByte)
  private def le32(x: Int) = Array[Byte]((x & 0xff).toByte,
    ((x >> 8) & 0xff).toByte, ((x >> 16) & 0xff).toByte,
    ((x >> 24) & 0xff).toByte)
  private def wav(chunks: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le32(4 + chunks.length) ++ "WAVE".getBytes ++ chunks
  private def fmt(code: Int, ch: Int, sr: Int, bits: Int): Array[Byte] =
    "fmt ".getBytes ++ le32(16) ++ le16(code) ++ le16(ch) ++ le32(sr) ++
      le32(sr * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)
  private def data(n: Int): Array[Byte] =
    "data".getBytes ++ le32(n) ++ new Array[Byte](n)

  test("fixture variants answer their contract") {
    // id 0: PCM, 1 ch, 8-bit (0%3=0), 8000 Hz, 1 frame
    assert(meta(AudioHeader.makeWav(0L))
      == Some(Seq(1L, 1L, 8000L, 8L, 1L, 0L)))
    // id 8: IEEE float 32-bit, 1 ch, 14000 Hz (8%5=3), 9 frames
    assert(meta(AudioHeader.makeWav(8L))
      == Some(Seq(3L, 1L, 14000L, 32L, 9L, 0L)))
    // torn (7), junk (9), AVI (10) are NULL
    assert(meta(AudioHeader.makeWav(7L)).isEmpty)
    assert(meta(AudioHeader.makeWav(9L)).isEmpty)
    assert(meta(AudioHeader.makeWav(10L)).isEmpty)
    // id 13 (13%4=1): the odd-LIST + pad variant still parses
    assert(meta(AudioHeader.makeWav(13L)).nonEmpty)
  }

  test("chunk order does not matter: data before fmt parses") {
    val b = wav(data(4) ++ fmt(1, 2, 44100, 16))
    assert(meta(b) == Some(Seq(1L, 2L, 44100L, 16L, 1L, 0L)))
  }

  test("an UNPADDED odd chunk desyncs the walk to NULL, a padded one not") {
    val odd = "LIST".getBytes ++ le32(5) ++ "INFO!".getBytes
    val bad = wav(fmt(1, 1, 8000, 8) ++ odd ++ data(8))
    assert(meta(bad).isEmpty, "missing pad byte must desync, not misparse")
    val good = wav(fmt(1, 1, 8000, 8) ++ odd ++ Array[Byte](0) ++ data(8))
    assert(meta(good) == Some(Seq(1L, 1L, 8000L, 8L, 8L, 1L)))
  }

  test("declared sizes are audited against real bytes") {
    // data claims 100 bytes but carries 4: torn, not trusted
    val lying = wav(fmt(1, 1, 8000, 8) ++ "data".getBytes ++ le32(100) ++
      new Array[Byte](4))
    assert(meta(lying).isEmpty)
    // dataSize not a multiple of the frame stride: inconsistent
    val ragged = wav(fmt(1, 2, 8000, 16) ++ data(5))
    assert(meta(ragged).isEmpty)
  }

  // ---- AudioFingerprint (q154) -----------------------------------------

  import graft.multimodal.AudioFingerprint

  private def pcm16(samples: Seq[Int], ch: Int = 1): Array[Byte] = {
    val body = samples.flatMap(s => Seq.fill(ch)(le16(s & 0xffff).toSeq)
      .flatten).toArray
    wav(fmt(1, ch, 8000, 16) ++ "data".getBytes ++
      le32(samples.length * 2 * ch) ++ body)
  }

  private def fp(b: Array[Byte]): Option[Long] =
    Option(AudioFingerprint.fingerprint(b)).map(_.longValue)

  test("fingerprint is EXACTLY invariant under uniform integer gain") {
    val samples = (0 until 260).map(i => (i * i * 7) % 123 - 61)
    val a = fp(pcm16(samples))
    val b = fp(pcm16(samples.map(_ * 3)))
    assert(a.nonEmpty && a == b,
      "a x3 gain moved the energy contour — cross-multiplication broke")
  }

  test("8-bit unsigned and 16-bit signed of the same amplitudes agree") {
    val samples = (0 until 130).map(i => (i * 31) % 200 - 100)
    val b8body = samples.map(s => ((s + 128) & 0xff).toByte).toArray
    val b8 = wav(fmt(1, 1, 8000, 8) ++ "data".getBytes ++
      le32(samples.length) ++ b8body)
    assert(fp(b8).nonEmpty && fp(b8) == fp(pcm16(samples)))
  }

  test("stereo mixes by channel sum: duplicating the channel is a pure gain") {
    val samples = (0 until 195).map(i => (i * 17) % 90 - 45)
    assert(fp(pcm16(samples, ch = 2)) == fp(pcm16(samples, ch = 1)))
  }

  test("non-integer-PCM and corrupt bytes are NULL, never a throw") {
    // IEEE float (code 3) parses as a header but is not fingerprintable
    val f32 = wav(fmt(3, 1, 8000, 32) ++ data(8))
    assert(fp(f32).isEmpty)
    assert(fp("JUNKJUNKJUNKJUNK".getBytes).isEmpty)
    assert(fp(null).isEmpty)
    assert(fp(pcm16(Seq.empty)).isEmpty, "zero frames cannot contour")
  }

  test("q154 fixture contract: gain twin identical, bump within the Hamming ball, far far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (m <- Seq(1L, 3L, 5L)) { // odd motifs: the v1 twin is not corrupt
      val v0 = fp(AudioFingerprint.makeFpWav(4 * m)).get
      val v1 = fp(AudioFingerprint.makeFpWav(4 * m + 1)).get
      val v2 = fp(AudioFingerprint.makeFpWav(4 * m + 2)).get
      val v3 = fp(AudioFingerprint.makeFpWav(4 * m + 3)).get
      assert(v0 == v1, s"motif $m: the x2 gain twin drifted")
      assert(ham(v0, v2) <= 2, s"motif $m: the bump left the Hamming ball")
      assert(ham(v0, v3) > 3, s"motif $m: the salted contour is too near")
    }
    assert(fp(AudioFingerprint.makeFpWav(9L)).isEmpty, "doc%8==1 is corrupt")
  }

  private def vad(b: Array[Byte], t: Long): Option[Seq[Long]] =
    Option(AudioFingerprint.vadStats(b, t)).map(_.toLongArray().toSeq)

  test("vadStats: hand-checked runs, exact threshold edge, corrupt null") {
    // 65 boxes of 1 frame each: active iff amp >= 7; plant
    // S A A S S A (then silence) → 2 segments, first active at 1
    val amps = Seq(3, 9, 9, 3, 3, 9) ++ Seq.fill(59)(2)
    val Some(r) = vad(pcm16(amps), 7L)
    assert(r == Seq(65L, 3L, 2L, 59L, 1L), s"got $r")
    // threshold is >= (sum >= t*frames): amp exactly t is ACTIVE
    val Some(edge) = vad(pcm16(Seq.fill(65)(7)), 7L)
    assert(edge(1) == 65L && edge(2) == 1L && edge(3) == 0L)
    assert(vad("JUNKJUNKJUNKJUNK".getBytes("US-ASCII"), 7L).isEmpty)
  }

  test("vadStats is absolute-threshold: a gain twin legitimately moves verdicts") {
    // fingerprints of v0 and the ×2 gain twin v1 are IDENTICAL (the
    // q154 invariance), but activity under a fixed threshold is not —
    // find a motif where the twin's verdicts differ, proving the two
    // operators answer different questions
    val moved = (1L to 40L by 2).exists { m =>
      val a = vad(AudioFingerprint.makeFpWav(4 * m), 600L).get
      val b = vad(AudioFingerprint.makeFpWav(4 * m + 1), 600L).get
      a(1) != b(1)
    }
    assert(moved, "×2 gain never moved an activity verdict across motifs")
  }
}
