package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.align.Aligners
import graft.model._
import graft.queries.AlignQueries

/** Seeded differential sweep over randomized aligner fixtures (round-7
  * verdict ask 4): for each of the [[DiffAlign]] seed variants — the
  * same generator the cross-engine DuckDB sweep uses, covering random
  * verse lengths, drop/perturb rules, junk-token no-match perturbations,
  * and whole-chapter empty transcriptions — the DISTRIBUTED aligner
  * (cogroup + per-chapter kernel, [[graft.align.AlignerDataset]]) must
  * produce row-for-row exactly what a LOCAL per-chapter evaluation of
  * the pure kernels produces on the collected fixture. This pins the
  * shuffle/encoder/group-ordering path on every fixture shape; the
  * kernel-vs-DuckDB axis is covered by `graft.DiffAlign` +
  * `tools/check.py` (recorded per round in SCALE notes).
  */
class DifferentialAlignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private type Row12 = (String, Int, Double, Double, Int, Double, Double,
    Int, String, Double, Double, Double)

  /** Local twin of AlignQueries.flatten over one chapter alignment. */
  private def localFlatten(ch: ChapterAlignment): Seq[Row12] =
    ch.verses.flatMap { v =>
      v.words.zipWithIndex.map { case (w, wpos) =>
        (ch.book, ch.chapter, ch.totalDuration, ch.overallConfidence,
          v.verseNum, v.start, v.end, wpos, w.text, w.start, w.end,
          w.confidence)
      }
    }

  private val seeds = 1 to 21

  for (seed <- seeds) {
    test(s"seed $seed: distributed aligners match local kernel evaluation") {
      val f = DiffAlign.fixtureFor(seed)
      val verses = AlignQueries.verseDs(spark, sf, f).collect()
        .groupBy(v => (v.book, v.chapter))
      val trans = AlignQueries.transDs(spark, sf, f).collect()
        .groupBy(t => (t.book, t.chapter))
      assert(verses.nonEmpty, s"fixture $f produced no verses")

      for (method <- Seq("greedy", "windowed", "verse_fuzzy")) {
        val expected = verses.toSeq.flatMap { case ((book, chapter), vs) =>
          localFlatten(Aligners.assembleChapter(book, chapter, method,
            vs.toSeq.sortBy(_.verseNum),
            trans.getOrElse((book, chapter), Array.empty[TranscribedWord])
              .toSeq.sortBy(_.seq),
            0.0))
        }.sortBy(_.toString)

        val got = AlignQueries.alignQuery(method, spark, sf, f)
          .collect().map { r =>
            (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
              r.getInt(4), r.getDouble(5), r.getDouble(6), r.getInt(7),
              r.getString(8), r.getDouble(9), r.getDouble(10),
              r.getDouble(11))
          }.toSeq.sortBy(_.toString)

        assert(got.size == expected.size,
          s"$method seed $seed: ${got.size} distributed rows vs " +
            s"${expected.size} local rows")
        // exact double equality: both paths run the identical kernel
        // code, so any drift is a real grouping/ordering/encoder bug
        assert(got == expected, s"$method seed $seed: first diff at " +
          got.zip(expected).indexWhere(p => p._1 != p._2))
      }
    }
  }
}
