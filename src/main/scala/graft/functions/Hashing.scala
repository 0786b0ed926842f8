package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing primitives used by the dedup / fingerprint
  * operators. Pure JVM, allocation-light, and invoked from Catalyst via
  * [[org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke]] so the
  * calls stay inside whole-stage codegen.
  *
  * FNV-1a + splitmix64 finalizer: both are public-domain constructions.
  */
object Hashing {

  /** FNV-1a 64 over UTF-8 bytes, finalized with splitmix64. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def unsignedLt(a: Long, b: Long): Boolean =
    (a ^ Long.MinValue) < (b ^ Long.MinValue)

  /** MinHash signature of a shingle set: for each of `numPerms` permutations
    * take the unsigned-min of a per-permutation re-mix of the shingle hash.
    * One pass over the shingles; O(shingles * numPerms) mixes, no allocation
    * beyond the output array. Empty input → all-ones signature (unsigned max).
    */
  def minhashSig(shingles: ArrayData, numPerms: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(numPerms)(-1L) // unsigned max
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = hash64(shingles.getUTF8String(i), 0L)
        var p = 0
        while (p < numPerms) {
          val g = mix(h ^ (0x9e3779b97f4a7c15L * (p + 1)))
          if (unsignedLt(g, mins(p))) mins(p) = g
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** LSH band buckets for a minhash signature: signature is split into
    * `bands` contiguous bands and each band is hashed to one bucket id.
    * Pairs sharing any (band, bucket) are candidate near-duplicates.
    */
  def bandBuckets(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val rowsPerBand = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var r = 0
      while (r < rowsPerBand) {
        h ^= sig.getLong(b * rowsPerBand + r)
        h *= 0x100000001b3L
        r += 1
      }
      out(b) = mix(h)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array: per-bit vote of token hashes. */
  def simhash64(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Polynomial rolling-hash fingerprint of an ordered token stream:
    * fp = ((h(t0)*P + h(t1))*P + ...) — order-sensitive, so documents with
    * the same bag of words but different order fingerprint differently.
    */
  def fingerprint(tokens: ArrayData): Long = {
    val P = 0x100000001b3L
    var fp = 0xcbf29ce484222325L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        fp = fp * P + hash64(tokens.getUTF8String(i), 0L)
      }
      i += 1
    }
    mix(fp)
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Interleave the low 32 bits of two longs into a Morton/Z-order key
    * (classic public-domain bit-spreading trick): sorting by the result
    * clusters rows so that a range filter on EITHER dimension touches a
    * bounded fraction of row groups — the multi-column analog of
    * single-key cluster sorting.
    */
  def interleave2(a: Long, b: Long): Long = {
    def spread(x0: Long): Long = {
      var x = x0 & 0xffffffffL
      x = (x | (x << 16)) & 0x0000ffff0000ffffL
      x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
      x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }
    spread(a) | (spread(b) << 1)
  }

  /** DSIR hashed n-gram feature buckets (Xie et al. 2023 §2.1's feature
    * hashing): for tokens t_1..t_n, emit n unigram buckets followed by
    * n−1 bigram buckets, each in [0, buckets). Unigram bucket = low bits
    * of [[hash64]](token); bigram bucket = low bits of
    * [[murmur64]](h_i·31 + h_{i+1}) over the two token hashes (wrapping
    * signed arithmetic — a kernel, not a plan expression, exactly so
    * ANSI overflow semantics never apply). `buckets` MUST be a power of
    * two: low-bit masking is what makes the signed JVM value and the
    * unsigned external replay agree on the bucket without an unsigned
    * modulo on either side.
    */
  def dsirBuckets(tokens: ArrayData, buckets: Int): ArrayData = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"dsirBuckets: buckets must be a power of two, got $buckets")
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val mask = (buckets - 1).toLong
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hash64(tokens.getUTF8String(i), 0L); i += 1 }
    val out = new Array[Int](2 * n - 1)
    i = 0
    while (i < n) { out(i) = (hs(i) & mask).toInt; i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = (murmur64(hs(i) * 31L + hs(i + 1)) & mask).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Token k-gram hashes by per-token hash combination: gram i hashes to
    * [[murmur64]] of the base-31 wrap-around fold of [[hash64]](t_i) ..
    * hash64(t_{i+k-1}) — n−k+1 grams, or ONE gram over all tokens for a
    * shorter-than-k document ([[F.shingles]]' short-doc posture). The
    * fold replaces string re-concatenation so an external engine can
    * replay grams from its per-TOKEN hash relation with integer
    * arithmetic alone (wrapping multiply-add mod 2^64, then the
    * murmur64 finalizer = DuckDB's hash(BIGINT)).
    */
  def kgramHashes(tokens: ArrayData, k: Int): ArrayData = {
    require(k > 0, s"kgramHashes: k must be positive, got $k")
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hash64(tokens.getUTF8String(i), 0L); i += 1 }
    val m = math.max(n - k + 1, 1)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var c = hs(i)
      var j = i + 1
      val end = math.min(i + k, n)
      while (j < end) { c = c * 31L + hs(j); j += 1 }
      out(i) = murmur64(c)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Johnson-Lindenstrauss sign projection of a milli-quantized vector
    * into `dims` dimensions: p_j = Σ_i sign(j,i)·m_i with sign(j,i) =
    * +1 iff murmur64(8191·j + i) is even (i < 8191, so (j,i) cells
    * never collide). The ±1 matrix is hash-DEFINED — nothing is stored
    * or broadcast, and the DuckDB oracle regenerates every sign via
    * hash() parity. Exact integer arithmetic throughout.
    */
  def jlProject(milli: ArrayData, dims: Int): ArrayData = {
    val n = milli.numElements()
    // hard contract (ADVICE r16): the (j, i) sign cells are disjoint
    // only while i < 8191 — a longer vector would silently reuse signs
    // across dimensions and degrade JL independence
    require(n < 8191, s"jlProject supports vectors of < 8191 dims, got $n")
    val out = new Array[Long](dims)
    var j = 0
    while (j < dims) {
      var s = 0L
      var i = 0
      while (i < n) {
        val m = milli.getLong(i)
        s += (if ((murmur64(8191L * j + i) & 1L) == 0L) m else -m)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  /** The classic xorshift-multiply 64-bit integer finalizer (a public
    * construction from the murmur/splitmix family; also what DuckDB uses
    * for `hash(BIGINT)`, which makes hash-deterministic sampling exactly
    * reproducible across both engines).
    */
  def murmur64(x0: Long): Long = {
    val M = 0xd6e8feb86659fd93L
    var x = x0
    x ^= x >>> 32; x *= M
    x ^= x >>> 32; x *= M
    x ^ (x >>> 32)
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * — the MOSS algorithm; public knowledge): hash every k-token gram,
    * slide a window of `w` gram hashes, keep each window's minimum
    * (rightmost on ties). Guarantees two documents sharing a token run of
    * length ≥ w+k-1 share at least one fingerprint, while keeping ~2/(w+1)
    * of the grams. Returns the DISTINCT selected hashes, sorted — a
    * compact partial-overlap sketch where [[fingerprint]] is all-or-
    * nothing on the whole document.
    */
  def winnow(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val m = math.max(n - k + 1, 1) // short docs yield one (short) gram
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (!tokens.isNullAt(j)) h = h * 0x100000001b3L + hash64(tokens.getUTF8String(j), 0L)
        j += 1
      }
      grams(i) = mix(h)
      i += 1
    }
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    if (m <= w) {
      // fewer grams than a window: keep the global minimum
      var best = grams(0)
      i = 1
      while (i < m) { if (unsignedLt(grams(i), best)) best = grams(i); i += 1 }
      selected += best
    } else {
      var start = 0
      while (start + w <= m) {
        var best = start
        var j = start
        while (j < start + w) {
          // rightmost minimum: strict comparison keeps the later index on ties
          if (!unsignedLt(grams(best), grams(j))) best = j
          j += 1
        }
        selected += grams(best)
        start += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }

  /** DEFLATE-compressed byte length of a string (java.util.zip raw
    * deflate, fixed level 6, no zlib wrapper) — the kernel behind the
    * CCNet/RefinedWeb-family compression-ratio quality signal: looping,
    * templated, or keyword-stuffed text compresses anomalously well,
    * and near-random noise barely compresses, so the deflated/raw ratio
    * brackets natural prose from both sides. Pure function of the bytes
    * and the fixed level — deterministic across rows, partitions, and
    * repeated runs within a JVM (zlib strategy is pinned by the JDK);
    * invoked via StaticInvoke so it stays inside whole-stage codegen.
    */
  def deflatedLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Bloom-filter membership probe against a word array (the same probe
    * sequence [[graft.functions.BloomF.add]] sets). Called from codegen
    * with the filter words as a LITERAL array, so the whole fact-side
    * pre-filter stays inside whole-stage codegen.
    */
  def bloomContains(words: ArrayData, numHashes: Int, key: Long): Boolean = {
    val numBits = words.numElements().toLong * 64
    var i = 0
    while (i < numHashes) {
      val h = mix(key ^ (0x9e3779b97f4a7c15L * (i + 1)))
      val idx = (((h % numBits) + numBits) % numBits).toInt
      if ((words.getLong(idx >> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Cosine similarity of two float vectors, accumulated in double.
    * Returns 0.0 for zero-norm inputs.
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Squared L2 distance of two float vectors in double precision. */
  def l2sqF(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x(i).toDouble - y(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Dot product of two float vectors in double precision. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x(i).toDouble * y(i); i += 1 }
    dot
  }

  /** Banded random-hyperplane LSH codes of a float vector: `tables`
    * independent codes of `planes` sign bits each (AND within a table, OR
    * across tables — the same amplification the MinHash band scheme uses).
    * A single AND-only code has recall ~(1-θ/π)^planes, which silently drops
    * moderate-similarity pairs; the union over tables drives recall → 1.
    * Plane components are pseudo-random ±1 derived from splitmix64 in
    * counter mode — fully deterministic, no driver-side state to broadcast.
    */
  def hyperplaneCodes(vec: ArrayData, planes: Int, tables: Int): ArrayData = {
    val x = vec.toFloatArray()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        var j = 0
        while (j < x.length) {
          // component_{t,p,j} = ±1 from a counter-mode hash
          val sign =
            if ((mix((t.toLong * planes + p) * 131071L + j) & 1L) == 0L) 1.0
            else -1.0
          s += sign * x(j)
          j += 1
        }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
