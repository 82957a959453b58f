package graft

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.cat.Kernels

/** Seeded fuzz comparison of the hand-rolled scalar kernels against
  * independent java.util.regex implementations of the original
  * combinator semantics (SURVEY §5 property tests). The kernels replace
  * regex scans for performance; these specs pin them to the regex
  * semantics across a hostile input distribution (whitespace runs,
  * unicode, separators, degenerate shapes).
  */
class KernelsFuzzSpec extends AnyFunSuite {

  private val Chars =
    "0123456789abcXYZ 跡件公斤無 \t\n\u000B\f\r:/-.,天дΩ".toCharArray
  private val rnd = new scala.util.Random(20260812L)

  private def randStr(): String = {
    val n = rnd.nextInt(12)
    val sb = new StringBuilder(n)
    (0 until n).foreach(_ => sb.append(Chars(rnd.nextInt(Chars.length))))
    sb.toString
  }

  private val Cases = 200000
  private def fuzz(label: String)(check: String => Unit): Unit = {
    // targeted seeds first, then random
    val seeds = Seq("", " ", "CI73", "ci 7 3", "2024-01-15 08:30:00",
      "0 days 02:05:00", "02:05:61", "25 公斤", "1件", "2.5kg", "nan", "<NA>",
      "2024/1/5", "1/5/2024", "12:34:56", "123:45", "9:5", "0days1:30",
      "CI 073 ", "a  b\tc", "..", "//", "2024-02-30", "2024-02-29 1:2:3")
    (seeds ++ Seq.fill(Cases)(randStr())).foreach { s =>
      try check(s)
      catch {
        case e: org.scalatest.exceptions.TestFailedException =>
          fail(s"$label mismatch on input ${s.map(c => f"\\u${c.toInt}%04x").mkString} (${e.getMessage})")
      }
    }
  }

  private def trimSp(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }
  private def upperU(s: String): String = UTF8String.fromString(s).toUpperCase.toString
  private def k(s: String): UTF8String = UTF8String.fromString(s)

  test("flightNorm matches strip/upper/pad regexes") {
    val p2 = Pattern.compile("^([A-Z0-9]{2})(\\d{2})$")
    val p1 = Pattern.compile("^([A-Z0-9]{2})(\\d{1})$")
    fuzz("flightNorm") { s =>
      val base = upperU(s.replaceAll("\\s+", ""))
      val m2 = p2.matcher(base)
      val padded = if (m2.matches()) m2.group(1) + "0" + m2.group(2) else base
      val m1 = p1.matcher(padded)
      val expect = if (m1.matches()) m1.group(1) + "00" + m1.group(2) else padded
      assert(Kernels.flightNorm(k(s)).toString == expect)
    }
  }

  test("flightValid matches the anchored regex") {
    val p = Pattern.compile("^[A-Z0-9]{2}\\d{3,4}$")
    fuzz("flightValid") { s =>
      val expect = s.isEmpty || p.matcher(s).matches()
      assert(Kernels.flightValid(k(s)).booleanValue() == expect)
    }
  }

  test("keyNorm matches strip/collapse/scrub/upper") {
    val ph = Set("", "nan", "none", "<na>", "null", "nat")
    fuzz("keyNorm") { s =>
      // Python str.strip() semantics: all whitespace, both ends
      val collapsed = s.replaceAll("^\\s+|\\s+$", "").replaceAll("\\s+", " ")
      val expect =
        if (ph.contains(collapsed.toLowerCase)) "" else upperU(collapsed)
      assert(Kernels.keyNorm(k(s)).toString == expect)
      // and idempotence
      val once = Kernels.keyNorm(k(s)).toString
      assert(Kernels.keyNorm(k(once)).toString == once)
    }
  }

  test("tightKeyNorm = keyNorm with all whitespace removed") {
    fuzz("tightKeyNorm") { s =>
      val expect = Kernels.keyNorm(k(s)).toString.replaceAll("\\s+", "")
      assert(Kernels.tightKeyNorm(k(s)).toString == expect)
    }
  }

  test("durationMinutes matches the search regex") {
    val p = Pattern.compile("(?:(\\d+)\\s*days\\s*)?(\\d{1,2}):(\\d{2})(?::(\\d{2}))?")
    val digits = Pattern.compile("^\\d+$")
    fuzz("durationMinutes") { s =>
      val t = trimSp(s)
      val m = p.matcher(t)
      val expect: Integer =
        if (t.isEmpty) null
        else if (m.find()) {
          val d = Option(m.group(1)).filter(_.nonEmpty).map(_.toLong).getOrElse(0L)
          val se = Option(m.group(4)).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
          Integer.valueOf((d * 1440 + m.group(2).toInt * 60 + m.group(3).toInt +
            (if (se >= 30) 1 else 0)).toInt)
        } else if (digits.matcher(t).matches() && t.length <= 9) Integer.valueOf(t.toInt)
        else null
      assert(Kernels.durationMinutes(k(s)) == expect)
    }
  }

  test("luggage value/unit/recompose match the regex forms") {
    val num = Pattern.compile("(\\d+(?:\\.\\d+)?)")
    fuzz("luggage") { s =>
      val t = trimSp(s)
      val m = num.matcher(t)
      val expectV: java.lang.Double =
        if (m.find()) java.lang.Double.valueOf(m.group(1)) else null
      assert(Kernels.luggageValue(k(s)) == expectV)
      val residue = t.replaceAll("[\\d\\s\\.]+", "")
      val expectU =
        if (t.isEmpty) ""
        else if (residue.contains("件")) "件"
        else if (Pattern.compile("公斤|kg|KG|Kg").matcher(residue).find()) "公斤"
        else residue
      assert(Kernels.luggageUnit(k(s)).toString == expectU)
      val expectR =
        if (expectV == null) ""
        else if (expectU.isEmpty) expectV.toString
        else {
          val d = expectV.doubleValue()
          (if (d == math.floor(d)) d.toLong.toString else d.toString) + expectU
        }
      assert(Kernels.luggageRecompose(k(s)).toString == expectR)
    }
  }

  test("dateKeyMmDd matches the year-strip + pad regexes") {
    val lead = Pattern.compile("^\\s*\\d{4}\\s*/")
    val tail = Pattern.compile("/\\s*\\d{4}\\s*$")
    val mmdd = Pattern.compile("^\\s*(\\d{1,2})\\s*/\\s*(\\d{1,2})\\s*$")
    fuzz("dateKeyMmDd") { s =>
      val slash = trimSp(s.map(c => if (c == '.' || c == '-') '/' else c))
      val noYear = tail.matcher(lead.matcher(slash).replaceAll(""))
        .replaceAll("")
      val m = mmdd.matcher(noYear)
      val expect =
        if (m.matches()) f"${m.group(1).toInt}%02d/${m.group(2).toInt}%02d"
        else noYear
      assert(Kernels.dateKeyMmDd(k(s)).toString == expect)
    }
  }

  test("idempotence / absorption algebra used by CollapseIdempotentNormalize") {
    fuzz("algebra") { s =>
      def f(fn: UTF8String => UTF8String): String => String =
        x => fn(k(x)).toString
      Seq[(String, UTF8String => UTF8String)](
        "keyNorm" -> Kernels.keyNorm, "tightKeyNorm" -> Kernels.tightKeyNorm,
        "flightNorm" -> Kernels.flightNorm, "timeHhmm" -> Kernels.timeHhmm,
        "airlineCode" -> Kernels.airlineCode, "luggageUnit" -> Kernels.luggageUnit
      ).foreach { case (_, fn) =>
        val once = f(fn)(s)
        assert(f(fn)(once) == once)
      }
      val tight = f(Kernels.tightKeyNorm)(s)
      assert(f(Kernels.keyNorm)(tight) == tight)
      assert(f(Kernels.tightKeyNorm)(f(Kernels.keyNorm)(s)) == tight)
    }
  }

  test("chunkSplit matches regex-split word grouping for several widths") {
    fuzz("chunkSplit") { s =>
      val words = s.split("\\s+").filter(_.nonEmpty).toSeq
      for (w <- Seq(1, 2, 3, 16)) {
        val expect = words.grouped(w).map(_.mkString(" ")).toSeq
        val got = Kernels.chunkSplit(k(s), w)
        val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
        assert(gotSeq == expect, s"w=$w")
      }
    }
  }

  test("quantize127: range bound, extremum hits +-127, zero/empty safe") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val r = new scala.util.Random(7L)
    for (caseNo <- 0 until 20000) {
      val n = r.nextInt(9)
      val v: Array[Float] =
        if (caseNo % 50 == 0) Array.fill(n)(0.0f) // all-zero path
        else Array.fill(n)((r.nextGaussian() * (1 + r.nextInt(100))).toFloat)
      val q = Kernels.quantize127(new GenericArrayData(v.map(x => x: Any)))
      val out = (0 until q.numElements()).map(q.getLong)
      assert(out.size == n)
      val maxAbs = if (n == 0) 0.0 else v.map(x => math.abs(x.toDouble)).max
      if (maxAbs == 0.0) assert(out.forall(_ == 0L))
      else {
        assert(out.forall(x => x >= -127 && x <= 127))
        // the max-magnitude coordinate quantizes to exactly +-127
        val i = v.indexWhere(x => math.abs(x.toDouble) == maxAbs)
        assert(math.abs(out(i)) == 127L, s"extremum ${v(i)} -> ${out(i)}")
        // sign preserved wherever |x| is at least half a quantization step
        v.indices.foreach { j =>
          if (math.abs(v(j).toDouble) * 127.0 / maxAbs >= 0.5)
            assert(math.signum(out(j).toDouble) == math.signum(v(j).toDouble))
        }
      }
    }
  }

  test("timeHhmm fallback path matches the search regex") {
    val p = Pattern.compile("(\\d{1,2}):(\\d{2})")
    fuzz("timeHhmm-fallback") { s =>
      val t = trimSp(s)
      // restrict to inputs with no date separator: the regex-fallback path
      if (t.indexOf('-') < 0 && t.indexOf('/') < 0) {
        val m = p.matcher(t)
        val expect =
          if (m.find()) f"${m.group(1).toInt}%02d:${m.group(2)}" else ""
        assert(Kernels.timeHhmm(k(s)).toString == expect)
      }
    }
  }
}
