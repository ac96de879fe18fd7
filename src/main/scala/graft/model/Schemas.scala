package graft.model

/** Fixed row models for the alignment engine (SURVEY.md §1). The reference
  * is schema-on-read JSON with drifting key spellings; the engine uses
  * fail-fast case classes and converts to the viewer-compat JSON shape
  * only at the sink (SURVEY.md §7.4 risk 4).
  */

/** One verse after the triple flatten of the bible JSON
  * (book → chapter → verse → words, hebrew_alignment_tool.py:177-199).
  */
case class Verse(
    book: String,
    chapter: Int,
    verseNum: Int,
    words: Seq[String],
    text: String,
    wordCount: Int)

object Verse {
  def fromWords(book: String, chapter: Int, verseNum: Int,
      words: Seq[String]): Verse =
    Verse(book, chapter, verseNum, words, words.mkString(" "), words.size)
}

/** One transcribed word in the unified provider-normalized shape
  * (SURVEY.md §1.4): Whisper chunks, Azure SDK ticks, and Azure batch REST
  * all project into this row.
  */
case class TranscribedWord(
    book: String,
    chapter: Int,
    seq: Int,
    text: String,
    start: Double,
    end: Double,
    confidence: Double)

/** Word-level alignment result (hebrew_alignment_tool.py:433-445). */
case class AlignedWord(
    text: String,
    start: Double,
    end: Double,
    confidence: Double)

/** Verse-level alignment result. `confidence` is only populated by the
  * estimated / verse-fuzzy strategies (the greedy/windowed root tool does
  * not emit per-verse confidence).
  */
case class AlignedVerse(
    verseNum: Int,
    text: String,
    start: Double,
    end: Double,
    wordCount: Int,
    confidence: Double,
    words: Seq[AlignedWord])

/** Chapter-level product (the alignment JSON, SURVEY.md §1.5). */
case class ChapterAlignment(
    book: String,
    chapter: Int,
    totalDuration: Double,
    overallConfidence: Double,
    verseCount: Int,
    method: String,
    transcribedWordCount: Int,
    verses: Seq[AlignedVerse])

/** Chapter audio descriptor used by the estimation strategies and the
  * trimmer (duration in seconds; samples optional — carried for the
  * RMS/trim path, empty for metadata-only runs).
  */
case class ChapterAudio(
    book: String,
    chapter: Int,
    path: String,
    sampleRate: Int,
    duration: Double,
    samples: Seq[Float])
