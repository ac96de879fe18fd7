package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.BibleReader
import graft.ops.{BookResolve, TranscriptNormalize}
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

class IoOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("BibleReader: triple flatten, Aramaic dropped, 1-based indices") {
    val json =
      """{"Gen": [[["בְּרֵאשִׁית","בָּרָא"],["וְהָאָרֶץ"]],[["וַיְכֻלּוּ"]]],
        |"Rut": [[["וַיְהִי","בִּימֵי"]]],
        |"Aramaic": [[["dropped"]]]}""".stripMargin
    val f = Files.createTempFile("bible", ".json")
    Files.write(f, json.getBytes(StandardCharsets.UTF_8))
    val verses = BibleReader.readVerses(spark, f.toString).collect()
      .sortBy(v => (v.book, v.chapter, v.verseNum))
    assert(!verses.exists(_.book == "Aramaic"))
    assert(verses.length == 4)
    val gen11 = verses.find(v =>
      v.book == "Gen" && v.chapter == 1 && v.verseNum == 1).get
    assert(gen11.words == Seq("בְּרֵאשִׁית", "בָּרָא"))
    assert(gen11.text == "בְּרֵאשִׁית בָּרָא" && gen11.wordCount == 2)
    assert(verses.exists(v => v.book == "Gen" && v.chapter == 2))
  }

  test("BookResolve: exact, alias, and case-insensitive in one join") {
    import spark.implicits._
    val data = Seq("Gen", "psalms", "Exod", "NotABook").toDF("code")
    val m = BookResolve.resolve(data, "code", spark)
      .select("code", "canonical").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(m("Gen") == Some("Gen"))
    assert(m("psalms") == Some("Psa"))
    assert(m("Exod") == Some("Exo"))
    assert(m("NotABook").isEmpty)
  }

  test("BookResolve diagnostics: missing and unused sets") {
    import spark.implicits._
    val data = Seq("Gen", "Qqq").toDF("code")
    val (missing, unused) = BookResolve.diagnostics(data, "code", spark)
    assert(missing.collect().map(_.getString(0)).toSeq == Seq("qqq"))
    assert(unused.count() == BookResolve.dimension(spark).count() - 1)
  }

  test("TranscriptNormalize: whisper chunks with null-timestamp repair") {
    import spark.implicits._
    val payload =
      """{"chunks":[
        |{"text":"בראשית","timestamp":[0.0,1.2]},
        |{"text":"ברא","timestamp":[null,null]}]}""".stripMargin
    val df = Seq(("Gen", 1, payload)).toDF("book", "chapter", "payload")
    val out = TranscriptNormalize.fromWhisper(df).collect()
      .sortBy(_.getInt(2))
    assert(out.length == 2)
    // null start→0.0, null end→0.5; constant confidence 0.8
    val r2 = out.find(_.getString(3) == "ברא").get
    assert(r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.5)
    assert(out.forall(_.getDouble(6) == 0.8))
  }

  test("TranscriptNormalize: azure ticks→seconds on both payload shapes") {
    import spark.implicits._
    val sdk =
      """{"NBest":[{"Confidence":0.91,"Words":[
        |{"Word":"בראשית","Offset":32000000,"Duration":5400000,"Confidence":0.93}]}]}"""
        .stripMargin
    val sdkOut = TranscriptNormalize.fromAzureSdk(
      Seq(("Gen", 1, sdk)).toDF("book", "chapter", "payload")).collect()
    assert(sdkOut.length == 1)
    assert(sdkOut(0).getDouble(4) == 3.2)
    assert(math.abs(sdkOut(0).getDouble(5) - 3.74) < 1e-9)
    assert(sdkOut(0).getDouble(6) == 0.93)

    val batch =
      """{"recognizedPhrases":[{"nbest":[{"confidence":0.88,"words":[
        |{"word":"ברא","offsetInTicks":10000000,"durationInTicks":5000000}]}]}]}"""
        .stripMargin
    val bOut = TranscriptNormalize.fromAzureBatch(
      Seq(("Gen", 1, batch)).toDF("book", "chapter", "payload")).collect()
    assert(bOut.length == 1)
    assert(bOut(0).getDouble(4) == 1.0 && bOut(0).getDouble(5) == 1.5)
    assert(bOut(0).getDouble(6) == 0.88) // phrase-level confidence carried
  }
}
