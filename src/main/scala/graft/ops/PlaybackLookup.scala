package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.ChapterAlignment

/** J6: the viewer's time-interval lookup — "which verse/word is active
  * at playback time t" (standalone_hebrew_tester.html:458-493). The
  * engine form is a point-in-interval join of playhead events against
  * the word intervals of an alignment.
  *
  * Scale: intervals are banded by integer second, so the join is a
  * broadcast/shuffle HASH join on (book, chapter, band) with a residual
  * range predicate — never a nested loop. Words spanning a second
  * boundary appear in every band they overlap (explode of the bounded
  * band sequence).
  */
object PlaybackLookup {

  /** Word intervals flattened from alignments, banded by second. */
  def wordIntervals(alignments: Dataset[ChapterAlignment]): DataFrame =
    alignments.toDF()
      .select(col("book"), col("chapter"), explode(col("verses")).as("v"))
      .select(col("book"), col("chapter"),
        col("v.verseNum").as("verse_num"),
        posexplode(col("v.words")).as(Seq("word_idx", "w")))
      .select(col("book"), col("chapter"), col("verse_num"),
        col("word_idx"),
        col("w.text").as("word"), col("w.start").as("start"),
        col("w.end").as("end"))
      .withColumn("band", explode(sequence(
        floor(col("start")).cast("long"),
        greatest(floor(col("end") - lit(1e-9)).cast("long"),
          floor(col("start")).cast("long")))))

  /** Join playhead rows (book, chapter, t) to their active word.
    * Interval semantics match the viewer: start <= t < end, half-open
    * (the next word owns the boundary instant).
    */
  def activeWords(alignments: Dataset[ChapterAlignment],
      playheads: DataFrame): DataFrame = {
    val intervals = wordIntervals(alignments)
    playheads
      .withColumn("band", floor(col("t")).cast("long"))
      .join(intervals, Seq("book", "chapter", "band"))
      .filter(col("t") >= col("start") && col("t") < col("end"))
      .drop("band")
  }
}
