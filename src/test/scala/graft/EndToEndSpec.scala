package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.align.{Aligners, AlignerDataset}
import graft.asr.{FakeTranscriber, TranscribeOp}
import graft.io.{AlignmentWriter, BibleReader}
import graft.model._
import graft.ops.PlaybackLookup
import java.nio.file.Files
import java.nio.charset.StandardCharsets

class EndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val bibleJson =
    """{"Gen": [[["בְּרֵאשִׁית","בָּרָא","אֱלֹהִים"],["וְהָאָרֶץ","הָיְתָה"]],
      |         [["וַיְכֻלּוּ","הַשָּׁמַיִם"]]],
      |"Oba": [[["חֲזוֹן","עֹבַדְיָה"]]]}""".stripMargin

  test("full pipeline: bible → transcribe → align → write → playback query") {
    import spark.implicits._
    val f = Files.createTempFile("bible_e2e", ".json")
    Files.write(f, bibleJson.getBytes(StandardCharsets.UTF_8))

    val verses = BibleReader.readVerses(spark, f.toString)
    assert(verses.count() == 4) // 2 + 1 + 1 verses across 3 chapters

    val ref = verses.collect().groupBy(v => (v.book, v.chapter))
      .map { case (k, vs) => k -> vs.sortBy(_.verseNum).flatMap(_.words).toSeq }
    val audio = verses.select("book", "chapter").distinct()
      .select(col("book"), col("chapter"), lit("x").as("path"),
        lit(16000).as("sampleRate"), lit(0.0).as("duration"),
        array().cast("array<float>").as("samples")).as[ChapterAudio]
    val trans = TranscribeOp.transcribe(audio,
      FakeTranscriber(ref, wordsPerSecond = 2.0))
    val aligned = AlignerDataset.alignChapters(verses, trans, "greedy")
    assert(aligned.count() == 3)

    // sink round-trip with nikkud intact
    val out = Files.createTempDirectory("e2e_out").toString
    AlignmentWriter.write(aligned, out, processingTimestamp = 42L)
    val back = spark.read.json(s"$out/book=Gen")
    assert(back.selectExpr("metadata.processing_timestamp").distinct()
      .collect().head.getLong(0) == 42L)

    // J6: playhead at 0.7 s in Gen 1 → second word (each word is 0.5 s)
    val playheads = Seq(("Gen", 1, 0.7), ("Gen", 1, 0.1), ("Oba", 1, 0.55))
      .toDF("book", "chapter", "t")
    val active = PlaybackLookup.activeWords(aligned, playheads)
      .select("book", "chapter", "t", "verse_num", "word_idx", "word")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getInt(4)))
      .toSet
    assert(active == Set(("Gen", 0.7, 1), ("Gen", 0.1, 0), ("Oba", 0.55, 1)))
  }

  test("playback lookup handles multi-second words via banding") {
    import spark.implicits._
    val ch = ChapterAlignment("Gen", 1, 10.0, 0.9, 1, "greedy", 1, Seq(
      AlignedVerse(1, "x", 0.0, 10.0, 2, 0.0, Seq(
        AlignedWord("long", 0.0, 7.5, 0.9),   // spans 8 bands
        AlignedWord("short", 7.5, 10.0, 0.9)))))
    val alignments = Seq(ch).toDS()
    val hits = PlaybackLookup.activeWords(alignments,
      Seq(("Gen", 1, 0.0), ("Gen", 1, 3.14), ("Gen", 1, 7.49),
        ("Gen", 1, 7.5), ("Gen", 1, 9.99))
        .toDF("book", "chapter", "t"))
      .select("t", "word").collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(hits(0.0) == "long" && hits(3.14) == "long" &&
      hits(7.49) == "long")
    assert(hits(7.5) == "short" && hits(9.99) == "short")
    // exactly one word active per playhead
    assert(hits.size == 5)
  }

  test("golden: four strategies produce byte-stable JSON") {
    import spark.implicits._
    val verses = Seq(
      Verse.fromWords("Gen", 1, 1, Seq("בְּרֵאשִׁית", "בָּרָא")),
      Verse.fromWords("Gen", 1, 2, Seq("אֱלֹהִים")))
    val trans = Seq(
      TranscribedWord("Gen", 1, 1, "בראשית", 0.0, 0.9, 0.8),
      TranscribedWord("Gen", 1, 2, "ברא", 1.0, 1.7, 0.6),
      TranscribedWord("Gen", 1, 3, "אלהים", 2.0, 2.8, 0.7))
    def render(c: ChapterAlignment): String =
      c.verses.map(v => s"${v.verseNum}:${v.start}-${v.end}:" +
        v.words.map(w => s"${w.start},${w.end},${w.confidence}")
          .mkString("|")).mkString(";") +
        s"#${c.totalDuration}#${c.overallConfidence}"

    val goldens = Map(
      "greedy" ->
        "1:0.0-1.7:0.0,0.9,0.8|1.0,1.7,0.6;2:2.0-2.8:2.0,2.8,0.7#2.8#0.6999999999999998",
      "windowed" ->
        "1:0.0-1.7:0.0,0.9,0.8|1.0,1.7,0.6;2:2.0-2.8:2.0,2.8,0.7#2.8#0.6999999999999998",
      "estimated" -> "1:0.0-5.0:0.0,2.5,0.1|2.5,5.0,0.1;2:5.0-10.0:5.0,10.0,0.1#10.0#0.1",
      "density" -> "1:0.0-6.67:0.0,3.33,0.1|3.33,6.67,0.1;2:6.67-10.0:6.67,10.0,0.1#10.0#0.1")
    goldens.foreach { case (method, expected) =>
      val got = render(Aligners.assembleChapter("Gen", 1, method, verses,
        trans, 10.0))
      assert(got == expected, s"golden mismatch for $method: $got")
    }
  }
}
