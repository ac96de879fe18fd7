package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.align.AlignerDataset
import graft.asr.TranscribeOp
import graft.io.{AlignmentWriter, BibleReader}
import graft.model.ChapterAudio
import graft.ops.BookResolve

/** CLI entry points mirroring the reference's commands
  * (hebrew_alignment_tool.py:512-518 `test <book> <chapter>` /
  * `diagnose` / `list`; trimmer `stats`). The ASR provider here is the
  * deterministic fake (zero-egress); production wires a real
  * Transcriber into the same pipeline.
  */
object Main {

  /** getOrCreate may return a session owned by the embedding process
    * (tests, notebooks); only stop what we created.
    */
  private def session(): (SparkSession, Boolean) = {
    val preExisting = SparkSession.getDefaultSession.isDefined
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    (s, !preExisting)
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "align" :: bible :: outDir :: rest =>
      val method = rest.headOption.getOrElse("estimated")
      val (spark, own) = session()
      import spark.implicits._
      val verses = BibleReader.readVerses(spark, bible)
      val aligned = method match {
        case "estimated" | "density" =>
          // duration estimated from word counts (2 words/s)
          val audio = verses.groupBy("book", "chapter")
            .agg(sum("wordCount").as("n"))
            .select(col("book"), col("chapter"),
              concat(col("book"), lit("_"), col("chapter")).as("path"),
              lit(16000).as("sampleRate"),
              (col("n") / 2.0).as("duration"),
              array().cast("array<float>").as("samples"))
            .as[ChapterAudio]
          AlignerDataset.alignEstimated(verses, audio, method)
        case m =>
          // fake transcription derived distributively per chapter — no
          // driver-side collect of the corpus
          val trans = TranscribeOp.transcribeFromVerses(verses)
          AlignerDataset.alignChapters(verses, trans, m)
      }
      // cache: the validate pass, the sink, and the count all consume
      // the alignment — without it the cogroup pipeline runs three times
      aligned.cache()
      // P12: the reference validates every chapter's aligned duration
      // against the audio before accepting it (process_chapter →
      // _validate_output). With the deterministic fake provider the two
      // timelines agree by construction, so this is expected to pass —
      // the gate is wired for the real-provider path, where ASR drift
      // is exactly what it catches.
      val rollup = aligned.toDF().select(col("book"), col("chapter"),
        col("totalDuration").as("total_duration"),
        col("overallConfidence").as("overall_confidence"),
        size(col("verses")).as("n_verses"))
      val audioDur = verses.groupBy("book", "chapter")
        .agg((sum("wordCount") / 2.0).as("audio_duration"))
      val flagged = graft.ops.DurationSanity.validate(rollup, audioDur,
        Seq("book", "chapter"), "total_duration", "overall_confidence",
        "n_verses", "audio_duration")
        .filter(!col("valid_strict") || !col("valid_lenient"))
        .count()
      AlignmentWriter.write(aligned, outDir)
      println(s"aligned ${aligned.count()} chapters -> $outDir" +
        (if (flagged > 0) s" ($flagged failed duration sanity)" else ""))
      aligned.unpersist()
      if (own) spark.stop()

    case "diagnose" :: bible :: Nil =>
      val (spark, own) = session()
      val verses = BibleReader.readVerses(spark, bible)
      val codes = verses.select("book").distinct()
      val (missing, unused) = BookResolve.diagnostics(codes, "book", spark)
      println(s"book codes: ${codes.count()}")
      println(s"unmapped codes: ${missing.collect().map(_.getString(0)).sorted.mkString(", ")}")
      println(s"unused mappings: ${unused.count()}")
      if (own) spark.stop()

    case "list" :: bible :: Nil =>
      val (spark, own) = session()
      BibleReader.readVerses(spark, bible)
        .groupBy("book").agg(max("chapter").as("chapters"),
          count(lit(1)).as("verses"))
        .orderBy("book").show(50, truncate = false)
      if (own) spark.stop()

    case _ =>
      System.err.println(
        """usage:
          |  align <bible.json> <outDir> [estimated|density|greedy|windowed|verse_fuzzy]
          |  diagnose <bible.json>
          |  list <bible.json>""".stripMargin)
      sys.exit(2)
  }
}
