package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.cat.Kernels

/** ScalaCheck properties (SURVEY §5 item 2) for the scalar kernels —
  * generator-driven with shrinking, complementing the seeded fuzz in
  * KernelsFuzzSpec. Run by sbt's native ScalaCheck integration.
  */
object KernelsProperties extends Properties("Kernels") {

  private val weird: Gen[String] = {
    val ch = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'),
      2 -> Gen.oneOf(':', '/', '-', '.', ','),
      1 -> Gen.oneOf('件', '公', '斤', '無', '跡', 'Ω', 'д'))
    Gen.listOf(ch).map(_.mkString)
  }

  private def k(s: String): UTF8String = UTF8String.fromString(s)

  property("keyNorm idempotent") = Prop.forAll(weird) { s =>
    val once = Kernels.keyNorm(k(s)).toString
    Kernels.keyNorm(k(once)).toString == once
  }

  property("keyNorm output has no interior whitespace runs or case") =
    Prop.forAll(weird) { s =>
      val out = Kernels.keyNorm(k(s)).toString
      !out.contains("  ") && !out.exists(c => c >= 'a' && c <= 'z') &&
        out == out.trim
    }

  property("flightNorm valid outputs stay fixed under re-normalization") =
    Prop.forAll(weird) { s =>
      val out = Kernels.flightNorm(k(s)).toString
      Kernels.flightNorm(k(out)).toString == out
    }

  property("flightValid accepts exactly the padded normal forms") =
    Prop.forAll(Gen.alphaUpperChar, Gen.alphaUpperChar,
      Gen.chooseNum(0, 9999)) { (a, b, n) =>
      val s = s"$a$b$n"
      val norm = Kernels.flightNorm(k(s)).toString
      // after normalization a 1-4 digit tail is always valid
      Kernels.flightValid(k(norm)).booleanValue()
    }

  property("durationMinutes bare digits act as minutes") =
    Prop.forAll(Gen.chooseNum(0, 1000000)) { n =>
      Kernels.durationMinutes(k(n.toString)) == Integer.valueOf(n)
    }

  property("durationMinutes day arithmetic") =
    Prop.forAll(Gen.chooseNum(0, 500), Gen.chooseNum(0, 99),
      Gen.chooseNum(0, 99), Gen.chooseNum(0, 99)) { (d, h, m, sec) =>
      val s = f"$d days $h%02d:$m%02d:$sec%02d"
      val expect = d * 1440 + h * 60 + m + (if (sec >= 30) 1 else 0)
      Kernels.durationMinutes(k(s)) == Integer.valueOf(expect)
    }

  property("luggage recompose embeds the parsed value") =
    Prop.forAll(Gen.chooseNum(0, 99), Gen.oneOf("件", "公斤", "kg", "KG")) {
      (n, unit) =>
        val out = Kernels.luggageRecompose(k(s"$n $unit")).toString
        out.startsWith(n.toString) &&
          (out.endsWith("件") || out.endsWith("公斤"))
    }

  property("polyHash stays in [0, p)") = Prop.forAll(weird) { s =>
    val h = Kernels.polyHash(k(s), 31, 1000000007L)
    h >= 0L && h < 1000000007L
  }

  property("timeHhmm output is empty or HH:MM-shaped") =
    Prop.forAll(weird) { s =>
      val out = Kernels.timeHhmm(k(s)).toString
      out.isEmpty || (out.length == 5 && out(2) == ':' &&
        out.patch(2, "", 1).forall(_.isDigit))
    }
}
