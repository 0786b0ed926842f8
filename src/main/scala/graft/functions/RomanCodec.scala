package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Roman numeral codec. The reference stores building categories as Roman
  * numerals I..XXX and de-Romanizes them into aggregate column names
  * (/root/reference/dags/aggregates_python_helpers.py:517-533, which uses
  * the `roman` pypi package). Re-implemented from the standard subtractive
  * notation — public knowledge.
  */
object RomanCodec {
  private val vals = Array(1000, 900, 500, 400, 100, 90, 50, 40, 10, 9, 5, 4, 1)
  private val syms =
    Array("M", "CM", "D", "CD", "C", "XC", "L", "XL", "X", "IX", "V", "IV", "I")

  def toRomanStr(n0: Int): String = {
    if (n0 <= 0 || n0 > 3999) return null
    val sb = new java.lang.StringBuilder
    var n = n0
    var i = 0
    while (n > 0) {
      while (n >= vals(i)) { sb.append(syms(i)); n -= vals(i) }
      i += 1
    }
    sb.toString
  }

  /** Catalyst-facing: Int → Roman numeral string (null outside 1..3999). */
  def toRoman(n: Int): UTF8String = {
    val s = toRomanStr(n)
    if (s == null) null else UTF8String.fromString(s)
  }

  private val digit: Map[Char, Int] =
    Map('I' -> 1, 'V' -> 5, 'X' -> 10, 'L' -> 50, 'C' -> 100, 'D' -> 500, 'M' -> 1000)

  def fromRomanStr(s: String): Int = {
    if (s == null || s.isEmpty) return 0
    var total = 0
    var prev = 0
    var i = s.length - 1
    while (i >= 0) {
      val v = digit.getOrElse(s.charAt(i), return 0) // 0 = invalid sentinel
      if (v < prev) total -= v else { total += v; prev = v }
      i -= 1
    }
    // round-trip check rejects malformed forms like "IIII"
    if (toRomanStr(total) == s) total else 0
  }

  /** Catalyst-facing: Roman numeral → Int (0 for invalid input). */
  def fromRoman(s: UTF8String): Int = fromRomanStr(if (s == null) null else s.toString)
}
