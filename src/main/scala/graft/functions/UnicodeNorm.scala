package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization (UAX #15, public): the step every
  * content-hash pipeline needs BEFORE hashing — "café" typed with a
  * precomposed é (U+00E9) and "café" typed with e + combining acute
  * (U+0065 U+0301) are canonically equivalent but byte-different, so
  * every exact-dedup, fingerprint, and shingle operator in this engine
  * (q16/q26/q17/…) treats them as distinct documents unless the corpus
  * is normalized first. The audit surface (q132) measures how much of
  * a corpus is denormalized — the decision input for running the
  * normalization pass at all.
  *
  * JDK `java.text.Normalizer` implements the same UAX #15 tables as
  * ICU/DuckDB's `nfc_normalize`, which is what makes the audit
  * full-oracle: both engines canonicalize identically by spec. Kernel
  * via StaticInvoke — whole-stage codegen, no UDF.
  */
object UnicodeNorm {

  /** NFC-normalized form of a string. */
  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val raw = s.toString
    // fast path: Normalizer.isNormalized avoids the rebuild for the
    // (overwhelmingly common) already-NFC document
    if (java.text.Normalizer.isNormalized(raw,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(raw,
      java.text.Normalizer.Form.NFC))
  }
}
