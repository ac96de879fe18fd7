package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fuzzy, HebrewNorm}

class FuzzySpec extends AnyFunSuite {

  test("ratio: exact, near, empty") {
    assert(Fuzzy.ratio("abcd", "abcd") == 100.0)
    assert(Fuzzy.ratio("abcd", "abce") == 75.0) // LCS=3, 2*3/8
    assert(Fuzzy.ratio("", "") == 100.0)
    assert(Fuzzy.ratio("a", "") == 0.0)
    assert(Fuzzy.ratio("kitten", "sitting") == 2.0 * 4 / 13 * 100)
  }

  test("partial_ratio finds embedded windows") {
    assert(Fuzzy.partialRatio("bcd", "abcdef") == 100.0)
    assert(Fuzzy.partialRatio("abc", "abc") == 100.0)
    assert(Fuzzy.partialRatio("xyz", "abcdef") == 0.0)
    // partial >= full ratio for substrings of different length
    assert(Fuzzy.partialRatio("abc", "zzabczz") == 100.0)
    assert(Fuzzy.ratio("abc", "zzabczz") < 100.0)
  }

  test("token_sort_ratio ignores token order") {
    assert(Fuzzy.tokenSortRatio("b a", "a b") == 100.0)
    assert(Fuzzy.tokenSortRatio("hello world", "world hello") == 100.0)
  }

  test("token_set_ratio golden value") {
    // inter="b c", t1="b c a", t2="b c d": max is ratio(t1,t2)=2*4/10
    assert(Fuzzy.tokenSetRatio("a b c", "b c d") == 80.0)
    assert(Fuzzy.tokenSetRatio("a b", "b a a") == 100.0)
  }

  test("ratio is symmetric and bounded (seeded samples)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val r = Fuzzy.ratio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(r == Fuzzy.ratio(b, a))
      assert(Fuzzy.partialRatio(a, b) >= 0.0)
      assert(Fuzzy.tokenSetRatio(a, b) <= 100.0)
    }
  }

  test("bit-parallel LCS equals DP oracle across block boundaries") {
    val rnd = new scala.util.Random(99)
    val alphabets = Seq("ab", "abcd", "אבגדה", "abcdefghij")
    for (alpha <- alphabets; _ <- 1 to 150) {
      val la = rnd.nextInt(200)
      val lb = rnd.nextInt(200)
      val a = (1 to la).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val b = (1 to lb).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(Fuzzy.lcsLength(a, b) == Fuzzy.lcsLengthDp(a, b),
        s"mismatch for a=$a b=$b")
    }
    // exact 64/65/128-length boundaries
    for (n <- Seq(63, 64, 65, 127, 128, 129)) {
      val a = "ab" * ((n + 1) / 2)
      val s = a.substring(0, n)
      assert(Fuzzy.lcsLength(s, s) == n)
      assert(Fuzzy.lcsLength(s, s.reverse) == Fuzzy.lcsLengthDp(s, s.reverse))
    }
  }

  test("partial_ratio scores truncated boundary alignments " +
    "(rapidfuzz semantics)") {
    // ADVICE golden: best interior window of "xxxab" gives 50; the
    // suffix overlap "ab" gives ratio("abcd","ab") = 2·2/(4+2) ≈ 66.7
    assert(Fuzzy.partialRatio("abcd", "xxxab") == 200.0 * 2 / 6)
    // prefix overlap: "cd" at the start of the longer string
    assert(Fuzzy.partialRatio("abcd", "cdxxx") == 200.0 * 2 / 6)
    // boundary windows never beat a perfect interior window
    assert(Fuzzy.partialRatio("ab", "zabz") == 100.0)
    // equal lengths also slide past both ends (no length discontinuity)
    assert(Fuzzy.partialRatio("ab", "ba") == 200.0 * 1 / 3)
  }

  test("bit-parallel partialRatio equals naive windowed-DP oracle") {
    def naive(a: String, b: String): Double = {
      val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
      if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
      val windows =
        (0 to l.length - s.length).map(i => l.substring(i, i + s.length)) ++
          (1 until s.length).flatMap(k =>
            Seq(l.substring(0, k), l.substring(l.length - k)))
      windows.map(w =>
        200.0 * Fuzzy.lcsLengthDp(s, w) / (s.length + w.length)).max
    }
    val rnd = new scala.util.Random(123)
    for (alpha <- Seq("ab", "אבגד", "abcdefgh"); _ <- 1 to 80) {
      val a = (1 to 1 + rnd.nextInt(60))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val b = (1 to 1 + rnd.nextInt(150))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(Fuzzy.partialRatio(a, b) == naive(a, b),
        s"partial mismatch a=$a b=$b")
    }
    // >64-char shorter strings: the substring-window interior path plus
    // boundary windows
    for (_ <- 1 to 20) {
      val a = (1 to 66 + rnd.nextInt(60)).map(_ => "abcd"(rnd.nextInt(4)))
        .mkString
      val b = (1 to 130 + rnd.nextInt(80)).map(_ => "abcd"(rnd.nextInt(4)))
        .mkString
      assert(Fuzzy.partialRatio(a, b) == naive(a, b))
    }
  }

  test("hebrew normalize strips nikkud, keeps letters") {
    assert(HebrewNorm.normalize("בְּרֵא") ==
      "ברא")
    assert(HebrewNorm.normalize("  אב   גד  ") ==
      "אב גד")
    assert(HebrewNorm.normalize("abc123") == "")
    assert(HebrewNorm.normalize("") == "")
    assert(HebrewNorm.normalize(null) == "")
  }

  test("normalized match is nikkud-insensitive") {
    val w1 = "בְּרֵאשִׁית"
    val w2 = "בראשית"
    assert(Fuzzy.ratio(HebrewNorm.normalize(w1), HebrewNorm.normalize(w2))
      == 100.0)
  }
}
