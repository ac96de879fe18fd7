package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DurationSanity

class DurationSanitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("P12: strict ×1.1 and lenient ×1.2 gates, verse and confidence " +
    "floors") {
    import spark.implicits._
    val aligned = Seq(
      // (book, total, conf, verses): exactly at ×1.1 — valid (<=)
      ("at_limit", 11.0, 0.9, 10L),
      ("over_strict", 11.5, 0.9, 10L),  // >1.1, <=1.2: strict-only reject
      ("over_both", 12.5, 0.9, 10L),    // >1.2: both reject
      ("no_verses", 5.0, 0.9, 0L),      // lenient rejects empty chapters
      ("low_conf", 5.0, 0.05, 10L),     // lenient rejects conf < 0.1
      ("clean", 9.0, 0.9, 10L))
      .toDF("book", "total_duration", "overall_confidence", "n_verses")
    val audio = Seq(
      ("at_limit", 10.0), ("over_strict", 10.0), ("over_both", 10.0),
      ("no_verses", 10.0), ("low_conf", 10.0), ("clean", 10.0))
      .toDF("book", "audio_duration")
    val out = DurationSanity.validate(aligned, audio, Seq("book"),
      "total_duration", "overall_confidence", "n_verses", "audio_duration")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Boolean]("valid_strict"),
          r.getAs[Boolean]("valid_lenient"),
          r.getAs[Double]("duration_ratio")))).toMap
    assert(out("at_limit") == ((true, true, 1.1)))
    assert(out("over_strict") == ((false, true, 1.15)))
    assert(out("over_both") == ((false, false, 1.25)))
    assert(out("no_verses") == ((true, false, 0.5)))
    assert(out("low_conf") == ((true, false, 0.5)))
    assert(out("clean") == ((true, true, 0.9)))
  }
}
