package graft.functions.cat

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Hand-rolled scalar kernels backing the custom Catalyst expressions in
  * [[GraftExpr]]. Each is the exact semantics of the Column-combinator
  * version it replaces (golden tests in FunctionsSpec pin them), but as a
  * single JIT-friendly char scan: no regex engine, no exception-driven
  * parse misses, and — the original motivation — one static call in the
  * generated code instead of a multi-KB expression tree. The flight
  * pipeline's projection stage overflowed Janino's 64KB method limit
  * with the combinator forms and fell back to interpreted evaluation;
  * with these kernels the whole stage stays in whole-stage codegen.
  *
  * Referenced semantics: `etl/transform/unified_transformer.py:13-147,
  * 216-258`, `etl/transform/cola_transformer.py:50-119`,
  * `etl/transform/set_transformer.py:85-92` (reference repo paths).
  *
  * All methods take/return UTF8String (Spark's native string), are
  * called only on non-null input (null handling lives in the expression
  * wrapper), and use Java regex `\s` = `[ \t\n\x0B\f\r]` as the
  * whitespace class throughout.
  */
object Kernels {

  @inline private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'
  @inline private def isDigit(ch: Char): Boolean = ch >= '0' && ch <= '9'
  @inline private def isAsciiLetter(ch: Char): Boolean =
    (ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z')
  @inline private def isUpnum(ch: Char): Boolean =
    (ch >= 'A' && ch <= 'Z') || isDigit(ch)

  /** Spark's `trim()`: ASCII space only. */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  private def stripWs(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n && !isWs(s.charAt(i))) i += 1
    if (i == n) return s
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    while (i < n) {
      val ch = s.charAt(i)
      if (!isWs(ch)) sb.append(ch)
      i += 1
    }
    sb.toString
  }

  /** Unicode-correct uppercase identical to Spark's `upper()`. */
  private def upperU(s: String): String =
    UTF8String.fromString(s).toUpperCase.toString

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  // ---------------------------------------------------------------------
  // F2: to_time_hhmm
  // ---------------------------------------------------------------------

  private def daysInMonth(y: Int, m: Int): Int = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11 => 30
    case 2 => if (y % 4 == 0 && (y % 100 != 0 || y % 400 == 0)) 29 else 28
    case _ => 0
  }

  /** Parse `yyyy<sep>M<sep>d H:m[:s]` with full-string consumption and
    * calendar validation; returns h*100+m, or -1. */
  private def parseYmdTime(t: String, sep: Char, withSeconds: Boolean): Int = {
    val n = t.length
    var i = 0
    // exactly 4-digit year
    if (n < 4 || !isDigit(t.charAt(0)) || !isDigit(t.charAt(1)) ||
      !isDigit(t.charAt(2)) || !isDigit(t.charAt(3))) return -1
    val y = (t.charAt(0) - '0') * 1000 + (t.charAt(1) - '0') * 100 +
      (t.charAt(2) - '0') * 10 + (t.charAt(3) - '0')
    i = 4
    def field(sepCh: Char): Int = {
      if (i >= n || t.charAt(i) != sepCh) return -1
      i += 1
      if (i >= n || !isDigit(t.charAt(i))) return -1
      var v = t.charAt(i) - '0'
      i += 1
      if (i < n && isDigit(t.charAt(i))) { v = v * 10 + (t.charAt(i) - '0'); i += 1 }
      v
    }
    val mo = field(sep); if (mo < 1 || mo > 12) return -1
    val d = field(sep); if (d < 1 || d > daysInMonth(y, mo)) return -1
    val h = field(' '); if (h < 0 || h > 23) return -1
    val mi = field(':'); if (mi < 0 || mi > 59) return -1
    if (withSeconds) {
      val se = field(':'); if (se < 0 || se > 59) return -1
    }
    if (i != n) return -1
    h * 100 + mi
  }

  /** Leftmost `(\d{1,2}):(\d{2})` (greedy hours, Java-regex backtracking
    * order); returns h*100+m packed, or -1. */
  private def findHhmm(t: String): Int = {
    val n = t.length
    var i = 0
    while (i < n) {
      if (isDigit(t.charAt(i))) {
        // greedy: two-digit hour first
        if (i + 4 < n && isDigit(t.charAt(i + 1)) && t.charAt(i + 2) == ':' &&
          isDigit(t.charAt(i + 3)) && isDigit(t.charAt(i + 4)))
          return ((t.charAt(i) - '0') * 10 + (t.charAt(i + 1) - '0')) * 100 +
            (t.charAt(i + 3) - '0') * 10 + (t.charAt(i + 4) - '0')
        if (i + 3 < n && t.charAt(i + 1) == ':' &&
          isDigit(t.charAt(i + 2)) && isDigit(t.charAt(i + 3)))
          return (t.charAt(i) - '0') * 100 +
            (t.charAt(i + 2) - '0') * 10 + (t.charAt(i + 3) - '0')
      }
      i += 1
    }
    -1
  }

  @inline private def pad2(v: Int, sb: java.lang.StringBuilder): Unit = {
    if (v < 10) sb.append('0')
    sb.append(v)
  }

  private def hhmmString(packed: Int): UTF8String = {
    val sb = new java.lang.StringBuilder(5)
    pad2(packed / 100, sb)
    sb.append(':')
    pad2(packed % 100, sb)
    utf8(sb.toString)
  }

  /** F2 (`unified_transformer.py:33-74`): full-datetime formats in the
    * reference's order, then the first `\d{1,2}:\d{2}` anywhere; "". */
  def timeHhmm(u: UTF8String): UTF8String = {
    val t = trimSpaces(u.toString)
    if (t.indexOf('-') >= 0 || t.indexOf('/') >= 0) {
      var p = parseYmdTime(t, '-', withSeconds = true) // %Y-%m-%d %H:%M:%S
      if (p < 0) p = parseYmdTime(t, '/', withSeconds = false) // %Y/%m/%d %H:%M
      if (p < 0) p = parseYmdTime(t, '-', withSeconds = false) // %Y-%m-%d %H:%M
      if (p >= 0) return hhmmString(p)
    }
    val f = findHhmm(t)
    if (f >= 0) hhmmString(f) else UTF8String.EMPTY_UTF8
  }

  // ---------------------------------------------------------------------
  // F6: to_date_yyyy_slash_mm_slash_dd
  // ---------------------------------------------------------------------

  /** Parse `yyyy<sep>M[<sep>d[ H:m[:s]]]` shapes; returns packed
    * y*10000+m*100+d or -1. `requireTime`: the format must include the
    * time part; `allowSeconds` likewise. */
  private def parseDateShape(t: String, sep: Char, withTime: Boolean,
                             withSeconds: Boolean): Int = {
    val n = t.length
    if (n < 4 || !isDigit(t.charAt(0)) || !isDigit(t.charAt(1)) ||
      !isDigit(t.charAt(2)) || !isDigit(t.charAt(3))) return -1
    val y = (t.charAt(0) - '0') * 1000 + (t.charAt(1) - '0') * 100 +
      (t.charAt(2) - '0') * 10 + (t.charAt(3) - '0')
    var i = 4
    def field(sepCh: Char): Int = {
      if (i >= n || t.charAt(i) != sepCh) return -1
      i += 1
      if (i >= n || !isDigit(t.charAt(i))) return -1
      var v = t.charAt(i) - '0'
      i += 1
      if (i < n && isDigit(t.charAt(i))) { v = v * 10 + (t.charAt(i) - '0'); i += 1 }
      v
    }
    val mo = field(sep); if (mo < 1 || mo > 12) return -1
    val d = field(sep); if (d < 1 || d > daysInMonth(y, mo)) return -1
    if (withTime) {
      val h = field(' '); if (h < 0 || h > 23) return -1
      val mi = field(':'); if (mi < 0 || mi > 59) return -1
      if (withSeconds) {
        val se = field(':'); if (se < 0 || se > 59) return -1
      }
    }
    if (i != n) return -1
    y * 10000 + mo * 100 + d
  }

  /** The lenient ISO fallback (the reference's `pd.to_datetime`, our
    * previous `try_to_timestamp(s)`): `yyyy-M-d[ |T]H:m[:s[.frac]]`. */
  private def parseLenientIso(t: String): Int = {
    val n = t.length
    if (n < 4 || !isDigit(t.charAt(0)) || !isDigit(t.charAt(1)) ||
      !isDigit(t.charAt(2)) || !isDigit(t.charAt(3))) return -1
    val y = (t.charAt(0) - '0') * 1000 + (t.charAt(1) - '0') * 100 +
      (t.charAt(2) - '0') * 10 + (t.charAt(3) - '0')
    var i = 4
    def field(sepOk: Char => Boolean): Int = {
      if (i >= n || !sepOk(t.charAt(i))) return -1
      i += 1
      if (i >= n || !isDigit(t.charAt(i))) return -1
      var v = t.charAt(i) - '0'
      i += 1
      if (i < n && isDigit(t.charAt(i))) { v = v * 10 + (t.charAt(i) - '0'); i += 1 }
      v
    }
    val mo = field(_ == '-'); if (mo < 1 || mo > 12) return -1
    val d = field(_ == '-'); if (d < 1 || d > daysInMonth(y, mo)) return -1
    if (i == n) return y * 10000 + mo * 100 + d
    val h = field(c => c == ' ' || c == 'T'); if (h < 0 || h > 23) return -1
    val mi = field(_ == ':'); if (mi < 0 || mi > 59) return -1
    if (i < n) {
      val se = field(_ == ':'); if (se < 0 || se > 59) return -1
      if (i < n && t.charAt(i) == '.') {
        i += 1
        val f0 = i
        while (i < n && isDigit(t.charAt(i))) i += 1
        if (i == f0) return -1
      }
    }
    if (i != n) return -1
    y * 10000 + mo * 100 + d
  }

  /** F6 (`cola_transformer.py:50-85`): strptime chain
    * `%Y-%m-%d %H:%M:%S`, `%Y-%m-%d`, `%Y/%m/%d %H:%M`, `%Y/%m/%d`,
    * then lenient ISO; result `YYYY/MM/DD` or "". */
  def dateYyyySlash(u: UTF8String): UTF8String = {
    val t = trimSpaces(u.toString)
    if (t.indexOf('-') < 0 && t.indexOf('/') < 0) return UTF8String.EMPTY_UTF8
    var p = parseDateShape(t, '-', withTime = true, withSeconds = true)
    if (p < 0) p = parseDateShape(t, '-', withTime = false, withSeconds = false)
    if (p < 0) p = parseDateShape(t, '/', withTime = true, withSeconds = false)
    if (p < 0) p = parseDateShape(t, '/', withTime = false, withSeconds = false)
    if (p < 0) p = parseLenientIso(t)
    if (p < 0) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(10)
    sb.append(p / 10000).append('/')
    pad2(p / 100 % 100, sb)
    sb.append('/')
    pad2(p % 100, sb)
    utf8(sb.toString)
  }

  // ---------------------------------------------------------------------
  // F3: duration_to_minutes
  // ---------------------------------------------------------------------

  /** Try the time part `(\d{1,2}):(\d{2})(?::(\d{2}))?` at position k
    * with Java-regex greediness; returns minutes-with-rounding or -1. */
  private def tryTimeAt(t: String, k: Int): Int = {
    val n = t.length
    var h = -1
    var after = -1
    if (k + 4 < n && isDigit(t.charAt(k)) && isDigit(t.charAt(k + 1)) &&
      t.charAt(k + 2) == ':' && isDigit(t.charAt(k + 3)) && isDigit(t.charAt(k + 4))) {
      h = (t.charAt(k) - '0') * 10 + (t.charAt(k + 1) - '0')
      after = k + 2
    } else if (k + 3 < n && isDigit(t.charAt(k)) && t.charAt(k + 1) == ':' &&
      isDigit(t.charAt(k + 2)) && isDigit(t.charAt(k + 3))) {
      h = t.charAt(k) - '0'
      after = k + 1
    } else return -1
    val m = (t.charAt(after + 1) - '0') * 10 + (t.charAt(after + 2) - '0')
    var total = h * 60 + m
    val sPos = after + 3
    if (sPos + 2 < n && t.charAt(sPos) == ':' &&
      isDigit(t.charAt(sPos + 1)) && isDigit(t.charAt(sPos + 2))) {
      val se = (t.charAt(sPos + 1) - '0') * 10 + (t.charAt(sPos + 2) - '0')
      if (se >= 30) total += 1
    }
    total
  }

  /** F3 (`unified_transformer.py:76-113`): leftmost
    * `(?:(\d+)\s*days\s*)?(\d{1,2}):(\d{2})(?::(\d{2}))?` anywhere,
    * else bare digits are already minutes, else null. */
  def durationMinutes(u: UTF8String): Integer = {
    val t = trimSpaces(u.toString)
    val n = t.length
    if (n == 0) return null
    var i = 0
    while (i < n) {
      if (isDigit(t.charAt(i))) {
        // optional greedy days prefix: digits+ ws* "days" ws*
        var e = i
        while (e < n && isDigit(t.charAt(e))) e += 1
        var w = e
        while (w < n && isWs(t.charAt(w))) w += 1
        if (w + 4 <= n && t.charAt(w) == 'd' && t.charAt(w + 1) == 'a' &&
          t.charAt(w + 2) == 'y' && t.charAt(w + 3) == 's') {
          var k = w + 4
          while (k < n && isWs(t.charAt(k))) k += 1
          val tm = tryTimeAt(t, k)
          if (tm >= 0) {
            var days = 0L
            var j = i
            while (j < e) { days = math.min(days * 10 + (t.charAt(j) - '0'), 1500000L); j += 1 }
            return Integer.valueOf((days * 1440L + tm).min(Int.MaxValue).toInt)
          }
        }
        // no days prefix: time must start right here
        val tm = tryTimeAt(t, i)
        if (tm >= 0) return Integer.valueOf(tm)
      }
      i += 1
    }
    // ^\d+$ -> already minutes
    var j = 0
    var v = 0L
    while (j < n && isDigit(t.charAt(j))) { v = v * 10 + (t.charAt(j) - '0'); if (v > Int.MaxValue) return null; j += 1 }
    if (j == n) Integer.valueOf(v.toInt) else null
  }

  // ---------------------------------------------------------------------
  // F4/F5: luggage
  // ---------------------------------------------------------------------

  /** First `\d+(\.\d+)?` anywhere as a double; null when absent. */
  def luggageValue(u: UTF8String): java.lang.Double = {
    val t = trimSpaces(u.toString)
    val n = t.length
    var i = 0
    while (i < n && !isDigit(t.charAt(i))) i += 1
    if (i == n) return null
    var e = i
    while (e < n && isDigit(t.charAt(e))) e += 1
    var end = e
    if (e + 1 < n && t.charAt(e) == '.' && isDigit(t.charAt(e + 1))) {
      end = e + 1
      while (end < n && isDigit(t.charAt(end))) end += 1
    }
    java.lang.Double.valueOf(java.lang.Double.parseDouble(t.substring(i, end)))
  }

  /** Residue after stripping `[\d\s.]`, canonicalized to 件 / 公斤
    * (kg/KG/Kg synonyms); "" for blank input. */
  def luggageUnit(u: UTF8String): UTF8String = {
    val t = trimSpaces(u.toString)
    if (t.isEmpty) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      if (!isDigit(ch) && !isWs(ch) && ch != '.') sb.append(ch)
      i += 1
    }
    val r = sb.toString
    if (r.indexOf('件') >= 0) return utf8("件")
    if (r.contains("公斤") || r.contains("kg") || r.contains("KG") || r.contains("Kg"))
      return utf8("公斤")
    utf8(r)
  }

  /** F5: `<number><unit>`, integral values without the decimal point;
    * "" when no number. A unit-less number keeps the double rendering
    * (`25` -> `"25.0"`), matching the combinator form's double cast. */
  def luggageRecompose(u: UTF8String): UTF8String = {
    val v = luggageValue(u)
    if (v == null) return UTF8String.EMPTY_UTF8
    val unit = luggageUnit(u).toString
    val d = v.doubleValue()
    if (unit.isEmpty) return utf8(java.lang.Double.toString(d))
    val nStr =
      if (d == math.floor(d) && !d.isInfinite) java.lang.Long.toString(d.toLong)
      else java.lang.Double.toString(d)
    utf8(nStr + unit)
  }

  // ---------------------------------------------------------------------
  // F1/F12: airline code, airport head token
  // ---------------------------------------------------------------------

  /** F1: leading ASCII letters, uppercased; "" when none. */
  def airlineCode(u: UTF8String): UTF8String = {
    val t = u.toString
    var e = 0
    while (e < t.length && isAsciiLetter(t.charAt(e))) e += 1
    if (e == 0) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(e)
    var i = 0
    while (i < e) {
      val ch = t.charAt(i)
      sb.append(if (ch >= 'a' && ch <= 'z') (ch - 32).toChar else ch)
      i += 1
    }
    utf8(sb.toString)
  }

  /** F12: first whitespace-delimited token of the space-trimmed input;
    * null for blank (pandas `"".split()[0]` is NaN); "" when the
    * trimmed value still *starts* with non-space whitespace (split's
    * leading empty field). */
  def headToken(u: UTF8String): UTF8String = {
    val t = trimSpaces(u.toString)
    if (t.isEmpty) return null
    var e = 0
    while (e < t.length && !isWs(t.charAt(e))) e += 1
    utf8(t.substring(0, e))
  }

  // ---------------------------------------------------------------------
  // J2 / F10 / F-C / F11: key + flight-number normalization
  // ---------------------------------------------------------------------

  private val PlaceholdersLower = Array("nan", "none", "<na>", "null", "nat")

  /** Python `str.strip()`: both ends, the full whitespace class — the
    * reference strips before collapsing, which is what makes keyNorm
    * idempotent (space-only trim would leave `"x\t"` -> `"x "` -> `"x"`
    * unstable across passes). */
  private def trimAllWs(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** J2 generic key (`unified_transformer.py:228-234`): strip (Python
    * semantics: all whitespace), collapse interior whitespace runs to
    * single spaces, scrub `nan`-family placeholders to "", uppercase
    * (Unicode, like Spark `upper`). */
  def keyNorm(u: UTF8String): UTF8String = {
    val t = trimAllWs(u.toString)
    var collapsed = t
    var i = 0
    var needs = false
    while (i < t.length && !needs) { if (isWs(t.charAt(i))) needs = true; i += 1 }
    if (needs) {
      val sb = new java.lang.StringBuilder(t.length)
      i = 0
      var inWs = false
      while (i < t.length) {
        val ch = t.charAt(i)
        if (isWs(ch)) { if (!inWs) sb.append(' '); inWs = true }
        else { sb.append(ch); inWs = false }
        i += 1
      }
      collapsed = sb.toString
    }
    if (collapsed.isEmpty) return UTF8String.EMPTY_UTF8
    var p = 0
    while (p < PlaceholdersLower.length) {
      if (collapsed.equalsIgnoreCase(PlaceholdersLower(p))) return UTF8String.EMPTY_UTF8
      p += 1
    }
    utf8(upperU(collapsed))
  }

  /** J2 tight key: keyNorm then strip remaining whitespace. */
  def tightKeyNorm(u: UTF8String): UTF8String =
    utf8(stripWs(keyNorm(u).toString))

  /** F10: strip all whitespace, uppercase, zero-pad `XX99` -> `XX099`
    * and `XX9` -> `XX009` tails. */
  def flightNorm(u: UTF8String): UTF8String = {
    val base = upperU(stripWs(u.toString))
    val n = base.length
    if (n == 4 && isUpnum(base.charAt(0)) && isUpnum(base.charAt(1)) &&
      isDigit(base.charAt(2)) && isDigit(base.charAt(3)))
      return utf8(base.substring(0, 2) + "0" + base.substring(2))
    if (n == 3 && isUpnum(base.charAt(0)) && isUpnum(base.charAt(1)) &&
      isDigit(base.charAt(2)))
      return utf8(base.substring(0, 2) + "00" + base.substring(2))
    utf8(base)
  }

  /** F-C: `""` or `^[A-Z0-9]{2}\d{3,4}$`. */
  def flightValid(u: UTF8String): java.lang.Boolean = {
    val t = u.toString
    val n = t.length
    if (n == 0) return java.lang.Boolean.TRUE
    if (n != 5 && n != 6) return java.lang.Boolean.FALSE
    if (!isUpnum(t.charAt(0)) || !isUpnum(t.charAt(1))) return java.lang.Boolean.FALSE
    var i = 2
    while (i < n) {
      if (!isDigit(t.charAt(i))) return java.lang.Boolean.FALSE
      i += 1
    }
    java.lang.Boolean.TRUE
  }

  // ---------------------------------------------------------------------
  // Text hashing
  // ---------------------------------------------------------------------

  /** Polynomial rolling hash over Unicode codepoints:
    * fold (acc*base + cp) mod p — identical to the combinator form
    * `aggregate(transform(sequence(1,length), i -> ascii(substr(i,1))),
    * 0, (a,c) -> (a*base+c) % p)`, which walked the string one
    * codepoint per generated-code loop iteration with a substring
    * allocation each. base*p stays below 2^63: no overflow. */
  def polyHash(u: UTF8String, base: Int, p: Long): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % p
      i += Character.charCount(cp)
    }
    acc
  }

  // ---------------------------------------------------------------------
  // J2 date key
  // ---------------------------------------------------------------------

  /** J2 date key (`unified_transformer.py:244-258`): `.`/`-` -> `/`,
    * strip one leading and one trailing 4-digit year, zero-pad to
    * `MM/DD` when the remainder is `\d{1,2}/\d{1,2}`; otherwise keep
    * the remainder verbatim. */
  def dateKeyMmDd(u: UTF8String): UTF8String = {
    val s0 = u.toString
    val sb0 = new java.lang.StringBuilder(s0.length)
    var i = 0
    while (i < s0.length) {
      val ch = s0.charAt(i)
      sb0.append(if (ch == '.' || ch == '-') '/' else ch)
      i += 1
    }
    var t = trimSpaces(sb0.toString)
    // leading ^\s*\d{4}\s*/
    var a = 0
    while (a < t.length && isWs(t.charAt(a))) a += 1
    if (a + 4 <= t.length && isDigit(t.charAt(a)) && isDigit(t.charAt(a + 1)) &&
      isDigit(t.charAt(a + 2)) && isDigit(t.charAt(a + 3))) {
      var j = a + 4
      while (j < t.length && isWs(t.charAt(j))) j += 1
      if (j < t.length && t.charAt(j) == '/') t = t.substring(j + 1)
    }
    // trailing /\s*\d{4}\s*$
    var b = t.length
    while (b > 0 && isWs(t.charAt(b - 1))) b -= 1
    if (b >= 4 && isDigit(t.charAt(b - 1)) && isDigit(t.charAt(b - 2)) &&
      isDigit(t.charAt(b - 3)) && isDigit(t.charAt(b - 4))) {
      var j = b - 4
      while (j > 0 && isWs(t.charAt(j - 1))) j -= 1
      if (j > 0 && t.charAt(j - 1) == '/') t = t.substring(0, j - 1)
    }
    // ^\s*(\d{1,2})\s*/\s*(\d{1,2})\s*$ -> zero-pad
    val n = t.length
    var p = 0
    while (p < n && isWs(t.charAt(p))) p += 1
    var m = -1
    if (p < n && isDigit(t.charAt(p))) {
      m = t.charAt(p) - '0'
      p += 1
      if (p < n && isDigit(t.charAt(p))) { m = m * 10 + (t.charAt(p) - '0'); p += 1 }
    }
    if (m >= 0) {
      while (p < n && isWs(t.charAt(p))) p += 1
      if (p < n && t.charAt(p) == '/') {
        p += 1
        while (p < n && isWs(t.charAt(p))) p += 1
        var d = -1
        if (p < n && isDigit(t.charAt(p))) {
          d = t.charAt(p) - '0'
          p += 1
          if (p < n && isDigit(t.charAt(p))) { d = d * 10 + (t.charAt(p) - '0'); p += 1 }
        }
        if (d >= 0) {
          while (p < n && isWs(t.charAt(p))) p += 1
          if (p == n) {
            val sb = new java.lang.StringBuilder(5)
            pad2(m, sb)
            sb.append('/')
            pad2(d, sb)
            return utf8(sb.toString)
          }
        }
      }
    }
    utf8(t)
  }

  /** All multi-table sign-LSH buckets of a float vector in one pass:
    * for each of `tables` hash tables, `bits` hyperplane projections
    * whose weights come from the LCG formula (see
    * `Similarity.lcgWeight`) — identical arithmetic in identical order
    * to the Column-combinator form, so results are bit-exact against
    * the DuckDB oracle. One tight loop of tables*bits*dim fused
    * multiply-adds replaces tables*bits interpreted higher-order
    * aggregate(transform(...)) expressions (HigherOrderFunctions do
    * not participate in whole-stage codegen). Assumes a null-free
    * vector, which the embedding schema guarantees. */
  def lcgBuckets(vec: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = t.toLong * bits * dim + j.toLong * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val h = (1103515245L * (base + i) + 12345L) % 2147483648L
          acc += vec.getFloat(i).toDouble * (h.toDouble / 2147483648.0 * 2.0 - 1.0)
          i += 1
        }
        if (acc >= 0) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Index (0-based, array order) of the centroid with the highest
    * cosine similarity to `vec`; `cents` is the k*dim row-major flat
    * centroid matrix. Ties keep the first (= lowest centroid id when
    * the matrix is built in id order). Cosines stay unrounded: both
    * engines fold identical doubles in identical order, so the argmax
    * matches any SQL oracle ordering by the same expression with the
    * same tie-break. Assumes null-free vectors and non-zero norms. */
  def nearestCentroid(vec: ArrayData, cents: ArrayData, dim: Int): Int = {
    val k = cents.numElements() / dim
    var nv = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i).toDouble; nv += x * x; i += 1 }
    val nvs = math.sqrt(nv)
    var best = 0
    var bestCos = java.lang.Double.NEGATIVE_INFINITY
    var j = 0
    while (j < k) {
      var dot = 0.0
      var nc = 0.0
      var i2 = 0
      while (i2 < dim) {
        val c = cents.getDouble(j * dim + i2)
        val x = vec.getFloat(i2).toDouble
        dot += x * c
        nc += c * c
        i2 += 1
      }
      val cos = dot / (nvs * math.sqrt(nc))
      if (cos > bestCos) { bestCos = cos; best = j }
      j += 1
    }
    best
  }

  private val WsSplit = java.util.regex.Pattern.compile("\\s+")

  /** 60-bit SimHash of whitespace-tokenized text in ONE pass — the
    * scalar form of the explode -> 60-parallel-bitsum aggregation
    * (signatures become a map-side computation with no shuffle at
    * all). Exact parity with the aggregate form: Spark `trim` strips
    * spaces only, `split("\\s+", -1)` is the same Java regex split
    * StringSplit runs (leading/trailing empty fields included), tokens
    * deduplicate, both polynomial hashes fold codepoints like
    * [[polyHash]], bit b < 30 comes from h1 >> b, else h2 >> (b-30),
    * each distinct token adds +-1 per bit, and bit b of the signature
    * is set when its sum is positive. Callers must pre-filter
    * trim(text) == "" rows — the aggregate form drops them (explode of
    * an empty array), a scalar cannot. */
  def simhash60(u: UTF8String): Long = {
    val full = u.toString
    var b0 = 0
    var e0 = full.length
    while (b0 < e0 && full.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && full.charAt(e0 - 1) == ' ') e0 -= 1
    val toks = WsSplit.split(full.substring(b0, e0), -1)
    val seen = new java.util.HashSet[String]()
    val sums = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (seen.add(tok)) {
        var h1 = 0L
        var h2 = 0L
        var i = 0
        while (i < tok.length) {
          val cp = tok.codePointAt(i)
          h1 = (h1 * 31 + cp) % 1000000007L
          h2 = (h2 * 37 + cp) % 999999937L
          i += Character.charCount(cp)
        }
        var b = 0
        while (b < 60) {
          val bit = if (b < 30) (h1 >> b) & 1L else (h2 >> (b - 30)) & 1L
          sums(b) += (if (bit == 1L) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (sums(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** 32 MinHash values over the document's distinct word 5-shingles in
    * ONE pass — the scalar form of explode -> hash -> 32 parallel min
    * aggregations (signatures become map-side, no shuffle; the
    * inverted index is then needed only for candidate verification).
    * Tokenization matches [[simhash60]] (Spark trim + the same Java
    * regex split); shingles are `k` consecutive tokens space-joined,
    * deduplicated; the base hash folds codepoints like [[polyHash]];
    * family j is ((2j+1)*h + j*j+7) mod 1e9+7. Returns null when the
    * doc has fewer than `k` tokens (the aggregate form has no shingle
    * rows there — callers filter nulls). */
  def minhash32(u: UTF8String, k: Int): ArrayData = {
    val full = u.toString
    var b0 = 0
    var e0 = full.length
    while (b0 < e0 && full.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && full.charAt(e0 - 1) == ' ') e0 -= 1
    val s = full.substring(b0, e0)
    if (s.isEmpty) return null
    val toks = WsSplit.split(s, -1)
    if (toks.length < k) return null
    val p = 1000000007L
    val mins = new Array[Long](32)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder(toks(i))
      var w = 1
      while (w < k) { sb.append(' ').append(toks(i + w)); w += 1 }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        var h = 0L
        var ci = 0
        while (ci < shingle.length) {
          val cp = shingle.codePointAt(ci)
          h = (h * 31 + cp) % p
          ci += Character.charCount(cp)
        }
        var j = 0
        while (j < 32) {
          val v = (h * (2 * j + 1) + (j * j + 7)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Hashes of the document's distinct word k-shingles in one pass —
    * the scalar feeding `TextDedup.shingleIndex`'s explode. Dedup is
    * by shingle STRING (two distinct shingles colliding in the hash
    * legitimately emit two equal values), exactly like
    * `array_distinct(shingles(text)) -> polyHash` — so the exploded
    * index is identical to the combinator form's, without
    * materializing per-row shingle strings through an interpreted
    * higher-order chain. Returns an empty array below k tokens. */
  def shingleHashes(u: UTF8String, k: Int): ArrayData = {
    val full = u.toString
    var b0 = 0
    var e0 = full.length
    while (b0 < e0 && full.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && full.charAt(e0 - 1) == ' ') e0 -= 1
    val s = full.substring(b0, e0)
    if (s.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val toks = WsSplit.split(s, -1)
    if (toks.length < k) return new GenericArrayData(Array.emptyLongArray)
    val p = 1000000007L
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
    var i = 0
    while (i <= toks.length - k) {
      val sb = new java.lang.StringBuilder(toks(i))
      var w = 1
      while (w < k) { sb.append(' ').append(toks(i + w)); w += 1 }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        var h = 0L
        var ci = 0
        while (ci < shingle.length) {
          val cp = shingle.codePointAt(ci)
          h = (h * 31 + cp) % p
          ci += Character.charCount(cp)
        }
        out += h
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Cosine similarity of two float vectors, folding exactly like the
    * combinator form: dot = sum(a_i*b_i) in index order (doubles),
    * result = dot / (sqrt(sum a_i^2) * sqrt(sum b_i^2)). Identical
    * IEEE operations in identical order -> bit-equal to
    * `aggregate(zip_with(...))`, which runs interpreted (HOFs skip
    * whole-stage codegen) and was the inner loop of every ANN pair
    * scorer. */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var d = 0.0
    var i = 0
    while (i < n) { d += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < n) { val x = b.getFloat(i).toDouble; nb += x * x; i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Two independent 64-bit mixes of a long key (SplitMix64 finalizer
    * with two seeds) feeding double-hashing bloom probes: probe i sets
    * bit (h1 + i*h2) mod m (Kirsch–Mitzenmacher). Deterministic — no
    * RNG, no object state — so a bloom built from the same key set is
    * bit-identical on any partitioning. */
  @inline private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Set the `k` bloom bits of `key` in `bits` (an Array[Long] bitset of
    * m = bits.length*64 bits; m must be a power of two). */
  def bloomSet(bits: Array[Long], key: Long, k: Int): Unit = {
    val m = bits.length << 6
    val h1 = splitmix64(key)
    val h2 = splitmix64(key ^ 0x5851f42d4c957f2dL) | 1L // odd => full cycle
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & (m - 1)).toInt
      bits(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Bloom membership probe — the filter side of [[bloomSet]]. `bloom`
    * is the aggregated bitset as array<long>. One kernel call per row
    * in the scan stage; no false negatives, false-positive rate
    * ~ (1 - e^(-kn/m))^k. */
  def bloomMightContain(key: Long, bloom: ArrayData, k: Int): Boolean = {
    val words = bloom.numElements()
    val m = words << 6
    val h1 = splitmix64(key)
    val h2 = splitmix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & (m - 1)).toInt
      if ((bloom.getLong(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Sign-LSH bucket id of a float vector against an explicit
    * hyperplane matrix: bit j set when sum_i vec(i)*planes(j)(i) >= 0,
    * accumulated left-to-right in element order — the same IEEE fold
    * as the Column-combinator form (`Similarity.signBucket`), so both
    * produce identical buckets and the DuckDB oracles that inline the
    * plane literals keep matching bit-for-bit. One kernel call per row
    * replaces `bits` interpreted HigherOrderFunction projections. */
  def signBucket(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val w = planes(j)
      var acc = 0.0
      var i = 0
      while (i < w.length) {
        acc = acc + vec.getFloat(i).toDouble * w(i)
        i += 1
      }
      if (acc >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** [[bloomMightContain]] over a raw long[] — the broadcast-variable
    * probe path, where the bitset arrives as an executor-local array
    * rather than a plan-literal ArrayData. */
  def bloomMightContainWords(key: Long, words: Array[Long], k: Int): Boolean = {
    val m = words.length << 6
    val h1 = splitmix64(key)
    val h2 = splitmix64(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & (m - 1)).toInt
      if ((words(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Z-order (Morton) interleave of the low `bits` bits of two
    * non-negative keys: result bit 2i is a's bit i, bit 2i+1 is b's
    * bit i. Sorting by this key clusters BOTH dimensions at every
    * scale, so a range-partitioned, z-sorted layout gives parquet
    * min/max pruning on either column — the standard data-layout trick
    * for 2-D selective scans over immutable corpora. Pure bit
    * arithmetic, mirrored term-by-term in the oracle SQL. */
  def zorder2(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Split text into consecutive `w`-word chunks (words = maximal
    * non-whitespace runs, as in [[simhash60]]/wordCount), each chunk
    * re-joined with single spaces — the unit of C4-style line/chunk
    * deduplication. One char scan, no regex, no per-word allocation
    * beyond the chunk strings themselves; empty/blank text yields an
    * empty array (mirroring the oracle's `length(trim(text)) > 0`
    * gate). The trailing chunk may hold fewer than `w` words. */
  def chunkSplit(u: UTF8String, w: Int): ArrayData = {
    val s = u.toString
    val n = s.length
    // count words first so the output array is exactly sized
    var words = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      if (i < n) { words += 1; while (i < n && !isWs(s.charAt(i))) i += 1 }
    }
    if (words == 0) return new GenericArrayData(Array.empty[Any])
    val nch = (words + w - 1) / w
    val out = new Array[Any](nch)
    i = 0
    var c = 0
    while (c < nch) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < w && i < n) {
        while (i < n && isWs(s.charAt(i))) i += 1
        if (i < n) {
          if (k > 0) sb.append(' ')
          val start = i
          while (i < n && !isWs(s.charAt(i))) i += 1
          sb.append(s, start, i)
          k += 1
        }
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Symmetric per-vector int8 quantization: q_i = floor(x_i * s + 0.5)
    * with s = 127 / max|x| (all-zero vectors quantize to zeros). Every
    * step — abs, max, the single division making the scale, the
    * multiply, +0.5, floor — is a correctly-rounded IEEE-754 double
    * operation, so any engine reproduces the exact same integers. The
    * values live in [-127, 127] (int8 range; carried as long for
    * arithmetic headroom downstream). Cosine over quantized vectors is
    * invariant to the per-vector scale, so ranking needs only the
    * integer dot products — see [[dotLong]]. */
  def quantize127(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Long](n)
    if (maxAbs > 0.0) {
      val s = 127.0 / maxAbs
      i = 0
      while (i < n) {
        out(i) = math.floor(vec.getFloat(i).toDouble * s + 0.5).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Exact int64 dot product of two long arrays (quantized vectors):
    * pure integer arithmetic, bit-identical on any engine and free of
    * float accumulation order concerns. |q_i| <= 127 keeps the sum far
    * from overflow for any realistic dimension. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Argmin-L2 codeword for ONE product-quantization subspace: compare
    * `vec[offset, offset+ds)` (float) against `cents` = k codewords of
    * `ds` doubles each, flat-packed. Distances accumulate (x-c)^2 in
    * ascending dimension order; strict `<` keeps the LOWEST codeword
    * index on exact ties — both folds an oracle engine can replay
    * bit-for-bit. Used for subquantizer training assignment AND final
    * encoding (the offset makes slicing unnecessary — no allocation). */
  def nearestSubCentroidL2(vec: ArrayData, cents: ArrayData,
                           offset: Int, ds: Int): Int = {
    val k = cents.numElements() / ds
    var best = 0
    var bestD = java.lang.Double.POSITIVE_INFINITY
    var j = 0
    while (j < k) {
      var d = 0.0
      var i = 0
      while (i < ds) {
        val diff = vec.getFloat(offset + i).toDouble - cents.getDouble(j * ds + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Per-query ADC lookup table: `lut[sub*ks + j]` = squared L2 between
    * the query's subvector `sub` and codeword `j` of that subspace —
    * m*ks doubles computed ONCE per query, so scoring a corpus row
    * costs m lookups instead of `dim` multiplies (Jégou et al., IVF-ADC).
    * Same (x-c)^2 ascending-dimension fold as the encoder. */
  def pqLut(q: ArrayData, cbooks: ArrayData, m: Int, ks: Int, ds: Int): ArrayData = {
    val out = new Array[Double](m * ks)
    var sub = 0
    while (sub < m) {
      var j = 0
      while (j < ks) {
        var d = 0.0
        var i = 0
        while (i < ds) {
          val diff = q.getFloat(sub * ds + i).toDouble -
            cbooks.getDouble((sub * ks + j) * ds + i)
          d += diff * diff
          i += 1
        }
        out(sub * ks + j) = d
        j += 1
      }
      sub += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: sum the code-selected lut cells in ascending subspace
    * order (a two-level fold — per-subspace sums, then the m-term outer
    * sum — which the oracle replays as list_sum over an m-ordered
    * list). */
  def pqAdcSum(lut: ArrayData, codes: ArrayData, ks: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var sub = 0
    while (sub < m) {
      acc += lut.getDouble(sub * ks + codes.getInt(sub))
      sub += 1
    }
    acc
  }
}
