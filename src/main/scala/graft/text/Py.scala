package graft.text

/** Python string-semantics helpers.
  *
  * The reference pipeline (rednote-hilab/dots.ocr) leans on CPython string
  * behavior — `str.strip()` (Unicode whitespace, wider than Java `trim`),
  * `str.rstrip(chars)`, `str.count`, `str.rfind`, `int(...)` — and the
  * per-turn text-equality contract requires matching them exactly.
  * See SURVEY.md §7.4.
  */
object Py {

  /** Python `str.isspace()` per code point: \t\n\v\f\r, \x1c-\x1f, space,
    * U+0085, plus Unicode Zs/Zl/Zp (which include NBSP U+00A0 — NOT
    * whitespace to Java's `Character.isWhitespace`).
    */
  def isSpace(c: Char): Boolean = {
    if (c == ' ' || (c >= '\t' && c <= '\r') || (c >= 28 && c <= 31) || c.toInt == 0x85) true
    else {
      val t = Character.getType(c)
      t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR || t == Character.PARAGRAPH_SEPARATOR
    }
  }

  /** Python `str.strip()` (no args). */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.rstrip()` (no args). */
  def rstrip(s: String): String = {
    var j = s.length
    while (j > 0 && isSpace(s.charAt(j - 1))) j -= 1
    s.substring(0, j)
  }

  /** Python `str.lstrip()` (no args). */
  def lstrip(s: String): String = {
    var i = 0
    while (i < s.length && isSpace(s.charAt(i))) i += 1
    s.substring(i)
  }

  /** Python `str.rstrip(chars)`. */
  def rstrip(s: String, chars: String): String = {
    var j = s.length
    while (j > 0 && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(0, j)
  }

  /** Python `str.count(sub)` — non-overlapping occurrences. */
  def count(s: String, sub: String): Int = {
    if (sub.isEmpty) return s.length + 1
    var n = 0
    var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  /** Python `str.rfind(sub)` — last index or -1. */
  def rfind(s: String, sub: String): Int = s.lastIndexOf(sub)

  /** Python `int(str)` — optional sign, digits with `_` separators between
    * digits; surrounding whitespace already stripped by callers. Throws
    * NumberFormatException on anything else (mirrors ValueError).
    */
  def pyInt(raw: String): BigInt = {
    val s = strip(raw)
    if (s.isEmpty) throw new NumberFormatException(raw)
    var i = 0
    var sign = 1
    if (s.charAt(0) == '+' || s.charAt(0) == '-') {
      if (s.charAt(0) == '-') sign = -1
      i = 1
    }
    if (i >= s.length) throw new NumberFormatException(raw)
    val sb = new StringBuilder
    var prevDigit = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') { sb.append(c); prevDigit = true }
      else if (c == '_') {
        // Python: underscores only between digits
        if (!prevDigit || i + 1 >= s.length || !s.charAt(i + 1).isDigit)
          throw new NumberFormatException(raw)
        prevDigit = false
      } else throw new NumberFormatException(raw)
      i += 1
    }
    if (sb.isEmpty) throw new NumberFormatException(raw)
    BigInt(sb.toString()) * sign
  }

  /** Python `str.isprintable()` per code point: everything except Other
    * (Cc/Cf/Cs/Co/Cn) and Separator (Zl/Zp/Zs) categories — but U+0020
    * space IS printable.
    */
  def isPrintable(cp: Int): Boolean = {
    if (cp == ' ') true
    else Character.getType(cp) match {
      case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
           Character.PRIVATE_USE | Character.UNASSIGNED |
           Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR |
           Character.SPACE_SEPARATOR => false
      case _ => true
    }
  }

  /** Python `repr(str)`: single quotes unless the string contains `'` but
    * no `"`; escapes backslash, the quote, \n \r \t; non-printable code
    * points as \xXX / \uXXXX / \UXXXXXXXX. Needed because the reference
    * stringifies parsed non-list JSON with `str()` before the repair ladder
    * (output_cleaner.py:424) and str(dict/list) is repr of the contents.
    */
  def reprStr(s: String): String = {
    val hasSingle = s.indexOf('\'') >= 0
    val hasDouble = s.indexOf('"') >= 0
    val quote: Char = if (hasSingle && !hasDouble) '"' else '\''
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append(quote)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == quote) sb.append('\\').append(quote)
      else if (cp == '\\') sb.append("\\\\")
      else if (cp == '\n') sb.append("\\n")
      else if (cp == '\r') sb.append("\\r")
      else if (cp == '\t') sb.append("\\t")
      else if (isPrintable(cp)) sb.appendCodePoint(cp)
      else if (cp <= 0xff) sb.append(f"\\x$cp%02x")
      else if (cp <= 0xffff) sb.append(f"\\u$cp%04x")
      else sb.append(f"\\U$cp%08x")
      i += Character.charCount(cp)
    }
    sb.append(quote)
    sb.toString
  }

  /** Python `repr(float)` — shortest round-trip digits, fixed notation for
    * decimal exponent in [-4, 15], else scientific with `e±NN`.
    * Needed so json.dumps of float-valued cell fields matches CPython bytes.
    */
  def floatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    // shortest precision 1..17 that round-trips. Locale.ROOT: a JVM whose
    // default locale uses comma decimal separators would render "3,14e+00"
    // and the round-trip toDouble (and the contract bytes) would break.
    var p = 1
    var sci: String = null
    while (p <= 17 && sci == null) {
      val cand = String.format(java.util.Locale.ROOT, "%." + (p - 1) + "e", Double.box(d))
      if (cand.toDouble == d) sci = cand else p += 1
    }
    if (sci == null) sci = String.format(java.util.Locale.ROOT, "%.16e", Double.box(d))
    // sci looks like -3.140000e+00 ; extract digits + exponent
    val neg = sci.startsWith("-")
    val body = if (neg) sci.substring(1) else sci
    val eIdx = body.indexOf('e')
    val mant = body.substring(0, eIdx).replace(".", "")
    val digits = {
      // trim trailing zeros from the shortest-format mantissa
      var m = mant
      while (m.length > 1 && m.endsWith("0")) m = m.substring(0, m.length - 1)
      m
    }
    val exp = body.substring(eIdx + 1).toInt
    val sign = if (neg) "-" else ""
    if (exp >= -4 && exp <= 15) {
      // fixed notation
      if (exp >= digits.length - 1) {
        sign + digits + "0" * (exp - (digits.length - 1)) + ".0"
      } else if (exp >= 0) {
        sign + digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
      } else {
        sign + "0." + "0" * (-exp - 1) + digits
      }
    } else {
      val m = if (digits.length == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (exp < 0) "-" else "+"
      val ea = math.abs(exp)
      val ed = if (ea < 10) "0" + ea else ea.toString
      sign + m + "e" + es + ed
    }
  }
}
