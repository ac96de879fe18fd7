package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.queries.AlignQueries
import graft.queries.AlignQueries.AlignFixture

/** Seeded differential sweep for the aligner oracles: the q60/q61/q64
  * recursive-CTE oracles normally run against ONE fixed 50-chapter
  * fixture; this main re-runs kernel + oracle over N seeded random
  * fixture variants (verse lengths, drop/perturb rules, junk-token
  * no-match perturbations, whole-chapter empty transcriptions) so the
  * cross-engine agreement is evidence about the RECURRENCES, not about
  * one lucky corpus.
  *
  * Usage: DiffAlign <sfDir> <outDir> [nSeeds=20] — dumps
  * `<outDir>/<q>_s<seed>/` parquet per variant plus `oracle_sql.json`,
  * in exactly [[Verify]]'s layout so `tools/check.py <sfDir> <outDir>`
  * performs the DuckDB hash compare unchanged.
  *
  * Seeds 1–3 pin the extremes (all-match, junk-everywhere, every
  * transcription empty); further seeds draw uniformly from the fixture
  * knobs. verseLen caps at 10 so verse texts stay inside the HUGEINT
  * LCS mask bound (126 chars) with margin.
  */
object DiffAlign {

  def fixtureFor(seed: Int): AlignFixture = seed match {
    // extremes first — the edges a random draw would rarely pin exactly
    case 1 => AlignFixture(dropMod = 0, perturbMod = 0) // all-match
    case 2 => AlignFixture(dropMod = 0, perturbMod = 1, perturbOff = 0,
      perturbJunk = true) // every word junked
    case 3 => AlignFixture(emptyChapterMod = 1) // every transcription empty
    case _ =>
      val r = new scala.util.Random(seed * 7919L)
      val dropMod = r.nextInt(8) match {
        case 0 | 1 => 0 // keep-all variant
        case m => m // 2..7
      }
      val perturbMod = r.nextInt(7) match {
        case 0 => 0
        case m => m // 1..6 (1 = perturb every kept word)
      }
      AlignFixture(
        nDocs = 20 + r.nextInt(31), // 20..50 chapters
        verseLen = 3 + r.nextInt(8), // 3..10
        dropMod = dropMod,
        dropOff = if (dropMod > 0) r.nextInt(dropMod) else 0,
        perturbMod = perturbMod,
        perturbOff = if (perturbMod > 0) r.nextInt(perturbMod) else 0,
        perturbJunk = r.nextBoolean(),
        emptyChapterMod = r.nextInt(4) match {
          case 0 => 0 // usually no empty chapters
          case m => m + 2 // 3..5 → some chapters empty
        })
  }

  val methods = Seq("greedy" -> "q60", "windowed" -> "q61",
    "verse_fuzzy" -> "q64")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val nSeeds = args.lift(2).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val oracles = scala.collection.mutable.SortedMap[String, String]()
    for (seed <- 1 to nSeeds) {
      val f = fixtureFor(seed)
      println(s"[diff-align] seed $seed: $f")
      for ((method, q) <- methods) {
        val name = s"${q}_s$seed"
        try {
          AlignQueries.alignQuery(method, spark, sfDir, f)
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          oracles(name) = AlignQueries.alignOracle(method, f)
        } catch { case e: Throwable =>
          System.err.println(s"[diff-align] $name failed: ${e.getMessage}")
        }
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracles.map { case (k, v) =>
        s"${OracleJson.quote(k)}: ${OracleJson.quote(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
