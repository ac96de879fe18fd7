package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.align.AlignerDataset
import graft.model._

/** The four alignment strategies (SURVEY.md §2.9) exercised end-to-end on
  * a deterministic fixture derived from the `documents` table: text is
  * transliterated to Hebrew letters (the kernels normalize to the Hebrew
  * block), split into 8-word verses per (book, chapter), and a synthetic
  * "transcription" is derived by dropping every 7th word and perturbing
  * every 5th — exercising matched, skipped, and estimated-tail paths.
  *
  * Not SQL-expressible (cursor-dependent merge) ⇒ rows-only driver check;
  * the semantics are covered by AlignersSpec golden/property tests.
  */
object AlignQueries {

  private val latin = "abcdefghijklmnopqrstuvwxyz0123456789"
  private val hebrew = "אבגדהוזחטיכלמנסעפצקרשתאבגדהוזחטיכלמנ"

  /** (book, chapter, pos, word) rows for doc_id < 50 — 50 chapters. */
  private def wordRows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(
        concat(lit("b"), (col("doc_id") % 5).cast("string")).as("book"),
        ((col("doc_id") / 5).cast("int") % 10 + 1).as("chapter"),
        posexplode(filter(split(translate(lower(col("text")), latin, hebrew),
          " "), w => w =!= "")).as(Seq("pos", "word")))

  private def verseDs(s: SparkSession, d: String): Dataset[Verse] = {
    import s.implicits._
    wordRows(s, d)
      .groupBy(col("book"), col("chapter"),
        (col("pos") / 8).cast("int").as("verse0"))
      .agg(sort_array(collect_list(struct(col("pos"), col("word"))))
        .as("pw"))
      .select(col("book"), col("chapter"),
        (col("verse0") + 1).as("verseNum"),
        transform(col("pw"), x => x.getField("word")).as("words"))
      .select(col("book"), col("chapter"), col("verseNum"), col("words"),
        concat_ws(" ", col("words")).as("text"),
        size(col("words")).as("wordCount"))
      .as[Verse]
  }

  private def transDs(s: SparkSession, d: String): Dataset[TranscribedWord] = {
    import s.implicits._
    wordRows(s, d)
      .filter(col("pos") % 7 =!= 3) // ASR "missed" words
      .select(col("book"), col("chapter"),
        (col("pos") + 1).as("seq"),
        when(col("pos") % 5 === 2, concat(col("word"), lit("א")))
          .otherwise(col("word")).as("text"),
        (col("pos") * 0.5).as("start"),
        (col("pos") * 0.5 + 0.4).as("end"),
        lit(0.9).as("confidence"))
      .as[TranscribedWord]
  }

  private def audioDs(s: SparkSession, d: String): Dataset[ChapterAudio] = {
    import s.implicits._
    wordRows(s, d)
      .groupBy(col("book"), col("chapter"))
      .agg(count(lit(1)).as("n"))
      .select(col("book"), col("chapter"),
        concat(col("book"), lit("_"), col("chapter"), lit(".mp3"))
          .as("path"),
        lit(16000).as("sampleRate"),
        (col("n") * 0.5 + 2.0).as("duration"),
        array().cast("array<float>").as("samples"))
      .as[ChapterAudio]
  }

  /** Flatten chapter alignments to per-word rows for the driver dump. */
  private def flatten(ds: Dataset[ChapterAlignment]): DataFrame =
    ds.toDF()
      .select(col("book"), col("chapter"),
        col("totalDuration").as("total_duration"),
        col("overallConfidence").as("overall_confidence"),
        explode(col("verses")).as("v"))
      .select(col("book"), col("chapter"), col("total_duration"),
        col("overall_confidence"),
        col("v.verseNum").as("verse_num"),
        col("v.start").as("verse_start"), col("v.end").as("verse_end"),
        posexplode(col("v.words")).as(Seq("wpos", "w")))
      .select(col("book"), col("chapter"), col("total_duration"),
        col("overall_confidence"), col("verse_num"), col("verse_start"),
        col("verse_end"), col("wpos"),
        col("w.text").as("word"), col("w.start").as("start"),
        col("w.end").as("end"), col("w.confidence").as("confidence"))
      .orderBy("book", "chapter", "verse_num", "wpos")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_align_greedy" -> ((s, d) =>
      flatten(AlignerDataset.alignChapters(verseDs(s, d), transDs(s, d),
        "greedy"))),
    "q61_align_windowed" -> ((s, d) =>
      flatten(AlignerDataset.alignChapters(verseDs(s, d), transDs(s, d),
        "windowed"))),
    "q62_align_estimated" -> ((s, d) =>
      flatten(AlignerDataset.alignEstimated(verseDs(s, d), audioDs(s, d),
        "estimated"))),
    "q63_align_density" -> ((s, d) =>
      flatten(AlignerDataset.alignEstimated(verseDs(s, d), audioDs(s, d),
        "density"))),
    "q64_align_verse_fuzzy" -> ((s, d) =>
      flatten(AlignerDataset.alignChapters(verseDs(s, d), transDs(s, d),
        "verse_fuzzy"))))

  /** Not SQL-expressible — rows-only checks. */
  def oracle: Map[String, String] = Map.empty
}
