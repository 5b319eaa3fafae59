package graft.config

/** Config-number parsing — a clean-room port of
  * `/root/reference/lib/parse-number.c`:
  *
  *  - [[parseNumber]]: strtoll base-0 semantics (C-like prefixes: `0x`
  *    hex, leading-`0` octal, else decimal), full-consume.
  *  - [[parseDecNumber]]: strictly base 10 (leading zeros are plain
  *    decimal).
  *  - [[parseNumberWithSuffix]]: [[parseNumber]] plus a ≤3-char suffix
  *    `[kKmMgG][iI]?[bB]?` — exponent ×1000 each step, the `i`
  *    modifier selects ×1024, a bare `b/B` is the ×1 byte unit
  *    (_parse_suffix, parse-number.c:51-85). The reference lexer feeds
  *    every LL_NUMBER through this (`lib/cfg-lex.l:302-322`), which is
  *    what lets config text say `log-msg-size(8Kib)`.
  */
object ParseNumber {

  /** strtoll(base 0)-style prefix consumption: returns (value, endIndex)
    * of the longest valid numeric prefix, or None when no digits. */
  private def strtollDetect(str: String): Option[(Long, Int)] = {
    var i = 0
    val n = str.length
    var neg = false
    if (i < n && (str(i) == '+' || str(i) == '-')) {
      neg = str(i) == '-'
      i += 1
    }
    if (i >= n) return None
    var base = 10
    if (i + 1 < n && str(i) == '0' && (str(i + 1) == 'x' || str(i + 1) == 'X')) {
      base = 16; i += 2
    } else if (str(i) == '0') base = 8
    val digStart = i
    def isDig(c: Char): Boolean =
      if (base == 16) Character.digit(c, 16) >= 0
      else if (base == 8) c >= '0' && c <= '7'
      else c.isDigit
    var acc = 0L
    while (i < n && isDig(str(i))) {
      acc = acc * base + Character.digit(str(i), base)
      i += 1
    }
    if (i == digStart) None
    else Some((if (neg) -acc else acc, i))
  }

  /** parse_number: base-detected, full consume. */
  def parseNumber(str: String): Option[Long] =
    strtollDetect(str).collect { case (v, end) if end == str.length => v }

  /** parse_dec_number: always base 10, leading zeros allowed. */
  def parseDecNumber(str: String): Option[Long] = {
    val (neg, s0) =
      if (str.startsWith("-")) (true, str.drop(1))
      else if (str.startsWith("+")) (false, str.drop(1))
      else (false, str)
    if (s0.isEmpty || !s0.forall(_.isDigit)) None
    else
      try {
        val v = java.lang.Long.parseLong(s0, 10)
        Some(if (neg) -v else v)
      } catch { case _: NumberFormatException => None }
  }

  private def validExponent(c: Char) = "kKmMgG".indexOf(c) >= 0
  private def validUnit(c: Char) = c == 'b' || c == 'B'

  /** parse_number_with_suffix. */
  def parseNumberWithSuffix(str: String): Option[Long] =
    strtollDetect(str).flatMap { case (v, end) =>
      val suffix = str.substring(end)
      if (suffix.isEmpty) Some(v)
      else if (suffix.length > 3) None
      else {
        // positional split (_parse_suffix): [exponent][base][unit]
        val (expC, baseC, unitC) = suffix.length match {
          case 3 => (suffix(0), suffix(1), suffix(2))
          case 2 =>
            if (validUnit(suffix(1))) (suffix(0), 0.toChar, suffix(1))
            else (suffix(0), suffix(1), 0.toChar)
          case 1 =>
            if (validExponent(suffix(0))) (suffix(0), 0.toChar, 0.toChar)
            else if (validUnit(suffix(0))) (0.toChar, 0.toChar, suffix(0))
            else return None
        }
        if (expC != 0 && !validExponent(expC)) return None
        if (baseC != 0 && baseC != 'i' && baseC != 'I') return None
        if (unitC != 0 && !validUnit(unitC)) return None
        val base = if (baseC == 'i' || baseC == 'I') 1024L else 1000L
        val pow = expC.toLower match {
          case 'k' => 1
          case 'm' => 2
          case 'g' => 3
          case _ => 0
        }
        try Some((1 to pow).foldLeft(v)((a, _) => Math.multiplyExact(a, base)))
        catch { case _: ArithmeticException => None }
      }
    }
}
