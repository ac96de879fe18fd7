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
  * All three ASR-driven kernels have full DuckDB oracles: the greedy
  * (q60) and windowed (q61) cursor merges run as recursive CTEs driving
  * the per-chapter cursor state with a bit-parallel LCS fold for the
  * indel similarity, and verse_fuzzy (q64) — cursor-free — scores each
  * verse against the full chapter transcription with the HUGEINT LCS
  * variants (see [[FuzzySql]]). AlignersSpec golden/property tests
  * cover the kernels besides.
  */
object AlignQueries {

  private val latin = "abcdefghijklmnopqrstuvwxyz0123456789"
  private val hebrew = "אבגדהוזחטיכלמנסעפצקרשתאבגדהוזחטיכלמנ"

  /** Parameterized fixture shape, identically interpreted by the Spark
    * builders and the DuckDB oracle renderings so seeded random variants
    * stay cross-engine comparable ([[graft.DiffAlign]]):
    *  - words at `pos % dropMod == dropOff` are "missed" by the ASR
    *    (`dropMod <= 0` keeps everything);
    *  - words at `pos % perturbMod == perturbOff` are perturbed —
    *    appended 'א' (near-match) or replaced by a junk token
    *    (`perturbJunk`, the no-match extreme);
    *  - chapters with `chapter % emptyChapterMod == 0` lose their ENTIRE
    *    transcription (the empty-transcription edge both kernels and
    *    oracles must agree on);
    *  - `verseLen` words per verse, `nDocs` chapters.
    * Defaults reproduce the fixed 50-chapter corpus of q60/q61/q64.
    */
  case class AlignFixture(
      nDocs: Int = 50, verseLen: Int = 8,
      dropMod: Int = 7, dropOff: Int = 3,
      perturbMod: Int = 5, perturbOff: Int = 2,
      perturbJunk: Boolean = false,
      emptyChapterMod: Int = 0) {

    /** Junk replacement: normalizes into the Hebrew block, shares no
      * letters with the transliteration alphabet's common mass.
      */
    val junk = "טטטטטטטטטט"

    private[AlignQueries] def keepCol =
      (if (dropMod > 0) col("pos") % dropMod =!= dropOff else lit(true)) &&
        (if (emptyChapterMod > 0) col("chapter") % emptyChapterMod =!= 0
         else lit(true))

    private[AlignQueries] def perturbCol =
      if (perturbMod <= 0) col("word")
      else when(col("pos") % perturbMod === perturbOff,
        if (perturbJunk) lit(junk) else concat(col("word"), lit("א")))
        .otherwise(col("word"))

    /** SQL twin of [[keepCol]] (w-CTE rows carry pos + chapter). */
    private[AlignQueries] def keepSql: String = {
      val parts =
        (if (dropMod > 0) Seq(s"pos % $dropMod <> $dropOff") else Nil) ++
          (if (emptyChapterMod > 0)
             Seq(s"chapter % $emptyChapterMod <> 0") else Nil)
      if (parts.isEmpty) "TRUE" else parts.mkString("(", " AND ", ")")
    }

    /** SQL twin of [[perturbCol]]. */
    private[AlignQueries] def perturbSql: String =
      if (perturbMod <= 0) "word"
      else if (perturbJunk)
        s"CASE WHEN pos % $perturbMod = $perturbOff THEN '$junk' " +
          "ELSE word END"
      else
        s"CASE WHEN pos % $perturbMod = $perturbOff THEN word || 'א' " +
          "ELSE word END"
  }

  /** The fixed corpus every driver query uses. */
  private val defaultFixture = AlignFixture()

  /** (book, chapter, pos, word) rows for doc_id < nDocs. */
  private def wordRows(s: SparkSession, d: String,
      f: AlignFixture = defaultFixture): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < f.nDocs)
      .select(
        concat(lit("b"), (col("doc_id") % 5).cast("string")).as("book"),
        ((col("doc_id") / 5).cast("int") % 10 + 1).as("chapter"),
        posexplode(filter(split(translate(lower(col("text")), latin, hebrew),
          " "), w => w =!= "")).as(Seq("pos", "word")))

  private[graft] def verseDs(s: SparkSession, d: String,
      f: AlignFixture = defaultFixture): Dataset[Verse] = {
    import s.implicits._
    wordRows(s, d, f)
      .groupBy(col("book"), col("chapter"),
        (col("pos") / f.verseLen).cast("int").as("verse0"))
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

  private[graft] def transDs(s: SparkSession, d: String,
      f: AlignFixture = defaultFixture): Dataset[TranscribedWord] = {
    import s.implicits._
    wordRows(s, d, f)
      .filter(f.keepCol) // ASR "missed" words / empty chapters
      .select(col("book"), col("chapter"),
        (col("pos") + 1).as("seq"),
        f.perturbCol.as("text"),
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

  /** W1-W3 as pure declarative SQL: the uniform estimated alignment
    * derived entirely in window arithmetic (verse window = chapter
    * duration / verse count; word window = verse duration / word count)
    * with floor-based portable rounding — validated the rounding form
    * that q62/q63's kernels now share, so the estimated KERNELS also
    * hash-match independent DuckDB derivations.
    */
  private def estimatedSql(s: SparkSession, d: String): DataFrame = {
    val words = wordRows(s, d)
    val durations = words.groupBy("book", "chapter")
      .agg((count(lit(1)) * 0.5 + 2.0).as("duration"))
    val withVerse = words
      .withColumn("verse_num", (col("pos") / 8).cast("int") + 1)
      .withColumn("word_idx", col("pos") % 8)
    val counts = withVerse.groupBy("book", "chapter")
      .agg(countDistinct(col("verse_num")).as("n_verses"))
    val verseSizes = withVerse.groupBy("book", "chapter", "verse_num")
      .agg(count(lit(1)).as("n_words"))
    def r2(c: org.apache.spark.sql.Column) =
      floor(c * 100 + 0.5) / 100
    withVerse
      .join(durations, Seq("book", "chapter"))
      .join(counts, Seq("book", "chapter"))
      .join(verseSizes, Seq("book", "chapter", "verse_num"))
      .withColumn("verse_dur", col("duration") / col("n_verses"))
      .withColumn("verse_start", (col("verse_num") - 1) * col("verse_dur"))
      .withColumn("word_dur", col("verse_dur") / col("n_words"))
      .select(col("book"), col("chapter"), col("verse_num"),
        col("word_idx"), col("word"),
        r2(col("verse_start")).as("v_start"),
        r2(col("verse_start") + col("verse_dur")).as("v_end"),
        r2(col("verse_start") + col("word_idx") * col("word_dur"))
          .as("w_start"),
        r2(col("verse_start") + (col("word_idx") + 1) * col("word_dur"))
          .as("w_end"))
      .orderBy("book", "chapter", "verse_num", "word_idx")
  }

  /** P12 duration-sanity gate over the 50-chapter fixture: "aligned"
    * total = the last transcribed-timeline word end (max pos · 0.5 +
    * 0.4), audio duration estimated at 0.4 s/word + 1 s lead-in — the
    * two timelines disagree more as chapters grow, exercising ok /
    * strict-reject / lenient-reject; every 3rd chapter gets a
    * below-floor confidence to exercise the fixed aligner's floor check.
    */
  private def durationSanity(s: SparkSession, d: String): DataFrame = {
    import graft.ops.DurationSanity
    val words = wordRows(s, d)
    val aligned = words.groupBy("book", "chapter")
      .agg((max(col("pos")) * 0.5 + 0.4).as("total_duration"),
        countDistinct((col("pos") / 8).cast("int")).as("n_verses"))
      .withColumn("overall_confidence",
        when(col("chapter") % 3 === 0, 0.05).otherwise(0.9))
    val audio = words.groupBy("book", "chapter")
      .agg((count(lit(1)) * 0.4 + 1.0).as("audio_duration"))
    DurationSanity.validate(aligned, audio, Seq("book", "chapter"),
      "total_duration", "overall_confidence", "n_verses", "audio_duration")
      .orderBy("book", "chapter")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_align_estimated_sql" -> ((s, d) => estimatedSql(s, d)),
    "q83_duration_sanity" -> ((s, d) => durationSanity(s, d)),
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

  /** Spark-side aligner run over an arbitrary fixture — the per-variant
    * unit of the seeded differential sweep ([[graft.DiffAlign]]).
    */
  def alignQuery(method: String, s: SparkSession, d: String,
      f: AlignFixture): DataFrame =
    flatten(AlignerDataset.alignChapters(verseDs(s, d, f), transDs(s, d, f),
      method))

  /** Oracle SQL matching [[alignQuery]] for the same fixture. */
  def alignOracle(method: String, f: AlignFixture): String = method match {
    case "greedy" => greedyOracle(f)
    case "windowed" => windowedOracle(f)
    case "verse_fuzzy" => verseFuzzyOracle(f)
    case other =>
      throw new IllegalArgumentException(s"no oracle for $other")
  }

  import FuzzySql.{lcsExpr, simExpr}

  /** Shared oracle CTEs: the word fixture (w), per-chapter ordered word
    * lists with normalized match keys (wl), and the transcription lists
    * plus the chapter rollup (tl) — identical inputs to what
    * [[verseDs]]/[[transDs]] feed the kernels.
    */
  private def wordCte(f: AlignFixture): String =
    s"""w AS (
       SELECT 'b' || CAST(doc_id % 5 AS VARCHAR) AS book,
         CAST((doc_id // 5) % 10 + 1 AS INTEGER) AS chapter,
         generate_subscripts(toks, 1) - 1 AS pos,
         unnest(toks) AS word
       FROM (
         SELECT doc_id, list_filter(string_split(
           translate(lower(text), '$latin', '$hebrew'), ' '),
           x -> x <> '') AS toks
         FROM documents WHERE doc_id < ${f.nDocs}))"""

  private def alignCtes(f: AlignFixture): String =
    s"""${wordCte(f)},
     wl AS (
       SELECT book, chapter,
         list(struct_pack(word := word,
           nw := regexp_replace(word, '[^א-ת]', '', 'g'),
           verse_num := CAST(pos // ${f.verseLen} + 1 AS INTEGER),
           wpos := CAST(pos % ${f.verseLen} AS INTEGER)) ORDER BY pos) AS ws
       FROM w GROUP BY book, chapter),
     tl AS (
       SELECT book, chapter,
         list(struct_pack(
           nt := regexp_replace(${f.perturbSql}, '[^א-ת]', '', 'g'),
           s := CAST(pos AS DOUBLE) * 0.5,
           e := CAST(pos AS DOUBLE) * 0.5 + 0.4) ORDER BY pos) AS ts,
         MAX(CAST(pos AS DOUBLE) * 0.5 + 0.4) AS total_duration,
         CAST(0.9 AS DOUBLE) AS overall_confidence
       FROM w WHERE ${f.keepSql} GROUP BY book, chapter)"""

  /** The anchor row of both aligner recursions: cursor at word 0,
    * transcription index 0, typed NULL output fields. LEFT join to tl:
    * the kernels still align a chapter whose transcription is EMPTY
    * (every word gets an estimated slot, rollup (0, 0)) — an inner join
    * would silently drop it. The fixture never produces one (pos 0 is
    * never dropped), but operator and oracle should agree on the edge.
    */
  private def alignAnchor: String =
    """SELECT wl.book, wl.chapter, ws,
         COALESCE(ts, CAST([] AS
           STRUCT(nt VARCHAR, s DOUBLE, e DOUBLE)[])) AS ts,
         0 AS k, 0 AS ti,
         CAST(0.0 AS DOUBLE) AS vend,
         CAST(NULL AS INTEGER) AS verse_num, CAST(NULL AS INTEGER) AS wpos,
         CAST(NULL AS VARCHAR) AS word, CAST(NULL AS DOUBLE) AS w_start,
         CAST(NULL AS DOUBLE) AS w_end, CAST(NULL AS DOUBLE) AS conf,
         CAST(NULL AS BOOLEAN) AS m
       FROM wl LEFT JOIN tl USING (book, chapter)"""

  /** Final projection shared by both aligner oracles; `verseStart`
    * differs (greedy: first MATCHED word's start; windowed: first
    * aligned word's start).
    */
  private def alignFinal(verseStart: String): String =
    s"""out AS (
         SELECT book, chapter, k, verse_num, wpos, word, w_start, w_end,
           conf, m
         FROM st WHERE k >= 1)
       SELECT o.book, o.chapter,
         COALESCE(t.total_duration, CAST(0.0 AS DOUBLE))
           AS total_duration,
         COALESCE(t.overall_confidence, CAST(0.0 AS DOUBLE))
           AS overall_confidence,
         o.verse_num,
         $verseStart AS verse_start,
         FIRST_VALUE(o.w_end) OVER
           (PARTITION BY o.book, o.chapter, o.verse_num ORDER BY o.k DESC)
           AS verse_end,
         o.wpos, o.word, o.w_start AS start, o.w_end AS "end",
         o.conf AS confidence
       FROM out o LEFT JOIN tl t USING (book, chapter)
       ORDER BY book, chapter, verse_num, wpos"""

  /** Portable 2-dp rounding, identical to Aligners.round2 and the
    * q62/q63 oracles: floor(x·100 + 0.5)/100.
    */
  private def r2(x: String): String = s"FLOOR($x * 100 + 0.5) / 100"

  /** q64 verse_fuzzy oracle: unlike greedy/windowed there is no cursor,
    * so no recursion — per-verse scores (max of partial / token_sort /
    * token_set against the FULL chapter transcription, via the HUGEINT
    * LCS variants in [[FuzzySql]]) plus the same word-density cumsum
    * timing as the q63 oracle. The chapter confidence mirrors the
    * kernel's sequential mean of ROUNDED verse confidences via a
    * list_reduce fold in verse order (a windowed AVG could differ in
    * the last ulp right at a .005 rounding boundary).
    */
  private def verseFuzzyOracle(f: AlignFixture): String = {
    import FuzzySql.{partialHuge, tokenSetHuge, tokenSortHuge}
    val L = f.verseLen
    val verseDur =
      """CASE WHEN total_words > 0
           THEN CAST(n_words AS DOUBLE) / total_words * total_duration
           ELSE total_duration / n_verses END"""
    s"""WITH ${wordCte(f)},
       verse AS (
         SELECT book, chapter, CAST(pos // $L + 1 AS INTEGER) AS verse_num,
           coalesce(array_to_string(list(word ORDER BY pos), ' '), '')
             AS vtext,
           count(*) AS n_words
         FROM w GROUP BY book, chapter, CAST(pos // $L + 1 AS INTEGER)),
       ch AS (
         SELECT book, chapter,
           coalesce(array_to_string(list(
             ${f.perturbSql}
             ORDER BY pos) FILTER (WHERE ${f.keepSql}), ' '), '') AS full,
           MAX(CAST(pos AS DOUBLE) * 0.5 + 0.4)
             FILTER (WHERE ${f.keepSql}) AS total_duration,
           count(*) AS total_words,
           count(DISTINCT CAST(pos // $L + 1 AS INTEGER)) AS n_verses
         FROM w GROUP BY book, chapter),
       scored AS (
         SELECT v.book, v.chapter, v.verse_num, v.n_words, v.vtext,
           ch.total_duration, ch.total_words, ch.n_verses,
           greatest(${partialHuge("v.vtext", "ch.full")},
             greatest(${tokenSortHuge("v.vtext", "ch.full")},
                      ${tokenSetHuge("v.vtext", "ch.full")})) / 100.0
             AS score
         FROM verse v JOIN ch USING (book, chapter)
         -- the kernel returns Seq.empty for a chapter with an empty
         -- transcription (total_duration is NULL exactly then); the
         -- fixture never produces one, but mirror the edge
         WHERE ch.total_duration IS NOT NULL),
       timed AS (
         SELECT *,
           $verseDur AS verse_dur,
           coalesce(SUM($verseDur) OVER (
             PARTITION BY book, chapter ORDER BY verse_num
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CAST(0.0 AS DOUBLE)) AS vstart_raw
         FROM scored),
       conf AS (
         SELECT book, chapter,
           ${r2("list_reduce(list(" + r2("score") +
        " ORDER BY verse_num), (x, y) -> x + y) / count(*)")}
             AS overall_confidence
         FROM timed GROUP BY book, chapter)
       SELECT t.book, t.chapter,
         ${r2("t.total_duration")} AS total_duration,
         c.overall_confidence,
         t.verse_num,
         ${r2("t.vstart_raw")} AS verse_start,
         ${r2("(t.vstart_raw + t.verse_dur)")} AS verse_end,
         CAST(w.pos % $L AS INTEGER) AS wpos, w.word,
         ${r2(s"(t.vstart_raw + (w.pos % $L) * (t.verse_dur / t.n_words))")}
           AS start,
         ${r2(s"(t.vstart_raw + ((w.pos % $L) + 1) * " +
        "(t.verse_dur / t.n_words))")} AS "end",
         ${r2("t.score")} AS confidence
       FROM w
       JOIN timed t ON t.book = w.book AND t.chapter = w.chapter
         AND t.verse_num = CAST(w.pos // $L + 1 AS INTEGER)
       JOIN conf c ON c.book = w.book AND c.chapter = w.chapter
       ORDER BY w.book, w.chapter, t.verse_num, wpos"""
  }

  /** Every alignment strategy is now independently oracle-checked. The
    * cursor kernels (q60 greedy, q61 windowed) are recursive CTEs
    * advancing one word per iteration (state = transcription cursor +
    * running verse end, all 50 chapters advance in parallel rows); the
    * indel similarity the cursor gates on is the bit-parallel LCS fold
    * — the whole sequential recurrence the old "not SQL-expressible"
    * justification covered is ~100 iterations of pure arithmetic at
    * fixture scale. q64 verse_fuzzy scores whole verses against the
    * ~700-char chapter transcription — past the 62-char BIGINT mask
    * bound — via the HUGEINT variants. The estimated kernels (q62
    * uniform, q63 density) and the declarative variant (q82) mirror the
    * kernels' arithmetic op-for-op (same associativity, same
    * floor-portable 2-dp rounding) so doubles match bit-exactly. These
    * strings avoid stripMargin: the LCS folds contain literal `|`
    * bitwise operators that a margin strip would eat if a wrap ever put
    * one at line head.
    */
  /** q60's oracle for an arbitrary fixture (seeded differential sweeps
    * run these against random variants — [[graft.DiffAlign]]).
    */
  def greedyOracle(f: AlignFixture): String =
      s"""WITH RECURSIVE
         ${alignCtes(f)},
         st AS (
           $alignAnchor
           UNION ALL
           SELECT book, chapter, ws, ts, k + 1,
             CASE WHEN m THEN ti + 1 ELSE ti END,
             CASE WHEN m THEN (ts[ti + 1]).e ELSE vin + 0.5 END,
             (ws[k + 1]).verse_num, (ws[k + 1]).wpos, (ws[k + 1]).word,
             CASE WHEN m THEN (ts[ti + 1]).s ELSE vin END,
             CASE WHEN m THEN (ts[ti + 1]).e ELSE vin + 0.5 END,
             CASE WHEN m THEN CAST(0.9 AS DOUBLE)
                  ELSE CAST(0.1 AS DOUBLE) END,
             m
           FROM (
             SELECT book, chapter, ws, ts, k, ti, vend,
               CASE WHEN k > 0 AND (ws[k]).verse_num = (ws[k + 1]).verse_num
                    THEN vend ELSE CAST(0.0 AS DOUBLE) END AS vin,
               (ws[k + 1]).nw AS a,
               CASE WHEN ti < len(ts) THEN (ts[ti + 1]).nt END AS b,
               (b IS NOT NULL AND
                 (CASE WHEN length(a) + length(b) = 0
                       THEN CAST(100.0 AS DOUBLE)
                       WHEN length(a) = 0 OR length(b) = 0
                       THEN CAST(0.0 AS DOUBLE)
                       ELSE 200.0 * ${lcsExpr("a", "b")}
                            / (length(a) + length(b))
                  END) / 100.0 >= 0.7) AS m
             FROM st WHERE k < len(ws))),
         ${alignFinal(
        """COALESCE(MIN(CASE WHEN o.m THEN o.w_start END) OVER
             (PARTITION BY o.book, o.chapter, o.verse_num),
             CAST(0.0 AS DOUBLE))""")}"""

  /** q64's oracle for an arbitrary fixture. */
  def fuzzyOracle(f: AlignFixture): String = verseFuzzyOracle(f)

  /** q61's oracle for an arbitrary fixture. */
  def windowedOracle(f: AlignFixture): String =
      s"""WITH RECURSIVE
         ${alignCtes(f)},
         st AS (
           $alignAnchor
           UNION ALL
           SELECT book, chapter, ws, ts, k + 1,
             CASE WHEN m THEN ti + best_off ELSE ti END,
             CASE WHEN m THEN (cands[best_off]).e ELSE vin + 0.4 END,
             (ws[k + 1]).verse_num, (ws[k + 1]).wpos, (ws[k + 1]).word,
             CASE WHEN m THEN (cands[best_off]).s ELSE vin END,
             CASE WHEN m THEN (cands[best_off]).e ELSE vin + 0.4 END,
             CASE WHEN m THEN CAST(0.9 AS DOUBLE) * mx
                  ELSE CAST(0.1 AS DOUBLE) END,
             m
           FROM (
             SELECT book, chapter, ws, ts, k, ti, vend,
               CASE WHEN k > 0 AND (ws[k]).verse_num = (ws[k + 1]).verse_num
                    THEN vend ELSE CAST(0.0 AS DOUBLE) END AS vin,
               (ws[k + 1]).nw AS a,
               ts[ti + 1:least(len(ts), ti + 5)] AS cands,
               list_transform(cands, c -> ${simExpr("a", "c.nt")}) AS sims,
               list_max(sims) AS mx,
               list_position(sims, mx) AS best_off,
               (mx IS NOT NULL AND mx >= 0.6) AS m
             FROM st WHERE k < len(ws))),
         ${alignFinal(
        """FIRST_VALUE(o.w_start) OVER
             (PARTITION BY o.book, o.chapter, o.verse_num ORDER BY o.k)""")}"""

  def oracle: Map[String, String] = Map(
    "q60_align_greedy" -> greedyOracle(defaultFixture),
    "q61_align_windowed" -> windowedOracle(defaultFixture),
    "q64_align_verse_fuzzy" -> verseFuzzyOracle(defaultFixture),

    "q83_duration_sanity" ->
      s"""WITH w AS (
         |  SELECT 'b' || CAST(doc_id % 5 AS VARCHAR) AS book,
         |    CAST((doc_id // 5) % 10 + 1 AS INTEGER) AS chapter,
         |    generate_subscripts(toks, 1) - 1 AS pos
         |  FROM (
         |    SELECT doc_id, list_filter(string_split(
         |      translate(lower(text), '$latin', '$hebrew'), ' '),
         |      x -> x <> '') AS toks
         |    FROM documents WHERE doc_id < 50)),
         |ch AS (
         |  SELECT book, chapter,
         |    CAST(MAX(pos) AS DOUBLE) * 0.5 + 0.4 AS total_duration,
         |    COUNT(DISTINCT CAST(pos // 8 AS INTEGER)) AS n_verses,
         |    CAST(COUNT(*) AS DOUBLE) * 0.4 + 1.0 AS audio_duration
         |  FROM w GROUP BY book, chapter)
         |SELECT book, chapter, total_duration, n_verses,
         |  CAST(CASE WHEN chapter % 3 = 0 THEN 0.05 ELSE 0.9 END AS DOUBLE)
         |    AS overall_confidence,
         |  audio_duration,
         |  FLOOR(total_duration / audio_duration * 10000 + 0.5) / 10000
         |    AS duration_ratio,
         |  total_duration <= audio_duration * 1.1 AS valid_strict,
         |  (n_verses > 0
         |   AND CAST(CASE WHEN chapter % 3 = 0 THEN 0.05 ELSE 0.9 END AS DOUBLE) >= 0.1
         |   AND total_duration <= audio_duration * 1.2) AS valid_lenient
         |FROM ch ORDER BY book, chapter""".stripMargin,

    "q62_align_estimated" ->
      s"""WITH w AS (
         |  SELECT 'b' || CAST(doc_id % 5 AS VARCHAR) AS book,
         |    CAST((doc_id // 5) % 10 + 1 AS INTEGER) AS chapter,
         |    generate_subscripts(toks, 1) - 1 AS pos,
         |    unnest(toks) AS word
         |  FROM (
         |    SELECT doc_id, list_filter(string_split(
         |      translate(lower(text), '$latin', '$hebrew'), ' '),
         |      x -> x <> '') AS toks
         |    FROM documents WHERE doc_id < 50)),
         |v AS (
         |  SELECT book, chapter, pos, word,
         |    CAST(pos // 8 + 1 AS INTEGER) AS verse_num,
         |    CAST(pos % 8 AS INTEGER) AS word_idx
         |  FROM w),
         |ch AS (
         |  SELECT book, chapter,
         |    CAST(COUNT(*) AS DOUBLE) * 0.5 + 2.0 AS duration,
         |    COUNT(DISTINCT CAST(pos // 8 AS INTEGER)) AS n_verses
         |  FROM w GROUP BY book, chapter),
         |vs AS (
         |  SELECT book, chapter, verse_num, COUNT(*) AS n_words
         |  FROM v GROUP BY book, chapter, verse_num)
         |SELECT v.book, v.chapter,
         |  FLOOR(duration * 100 + 0.5) / 100 AS total_duration,
         |  CAST(0.1 AS DOUBLE) AS overall_confidence,
         |  v.verse_num,
         |  FLOOR((v.verse_num - 1) * (duration / n_verses) * 100 + 0.5) / 100
         |    AS verse_start,
         |  FLOOR(v.verse_num * (duration / n_verses) * 100 + 0.5) / 100
         |    AS verse_end,
         |  v.word_idx AS wpos, v.word,
         |  FLOOR(((v.verse_num - 1) * (duration / n_verses)
         |    + v.word_idx * (duration / n_verses / n_words)) * 100 + 0.5) / 100
         |    AS start,
         |  FLOOR(((v.verse_num - 1) * (duration / n_verses)
         |    + (v.word_idx + 1) * (duration / n_verses / n_words)) * 100 + 0.5) / 100
         |    AS "end",
         |  CAST(0.1 AS DOUBLE) AS confidence
         |FROM v
         |JOIN ch USING (book, chapter)
         |JOIN vs USING (book, chapter, verse_num)
         |ORDER BY book, chapter, verse_num, wpos""".stripMargin,

    "q63_align_density" ->
      s"""WITH w AS (
         |  SELECT 'b' || CAST(doc_id % 5 AS VARCHAR) AS book,
         |    CAST((doc_id // 5) % 10 + 1 AS INTEGER) AS chapter,
         |    generate_subscripts(toks, 1) - 1 AS pos,
         |    unnest(toks) AS word
         |  FROM (
         |    SELECT doc_id, list_filter(string_split(
         |      translate(lower(text), '$latin', '$hebrew'), ' '),
         |      x -> x <> '') AS toks
         |    FROM documents WHERE doc_id < 50)),
         |v AS (
         |  SELECT book, chapter, pos, word,
         |    CAST(pos // 8 + 1 AS INTEGER) AS verse_num,
         |    CAST(pos % 8 AS INTEGER) AS word_idx
         |  FROM w),
         |ch AS (
         |  SELECT book, chapter,
         |    CAST(COUNT(*) AS DOUBLE) * 0.5 + 2.0 AS duration,
         |    COUNT(*) AS total_words
         |  FROM w GROUP BY book, chapter),
         |vs AS (
         |  SELECT book, chapter, verse_num, COUNT(*) AS n_words
         |  FROM v GROUP BY book, chapter, verse_num),
         |vd AS (
         |  SELECT vs.book, vs.chapter, vs.verse_num, vs.n_words,
         |    GREATEST(CAST(vs.n_words AS DOUBLE) / total_words * duration,
         |      CAST(1.0 AS DOUBLE)) AS verse_dur,
         |    duration
         |  FROM vs JOIN ch USING (book, chapter)),
         |cum AS (
         |  SELECT *, COALESCE(SUM(verse_dur) OVER (
         |    PARTITION BY book, chapter ORDER BY verse_num
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    CAST(0.0 AS DOUBLE)) AS verse_start_raw
         |  FROM vd)
         |SELECT v.book, v.chapter,
         |  FLOOR(duration * 100 + 0.5) / 100 AS total_duration,
         |  CAST(0.1 AS DOUBLE) AS overall_confidence,
         |  v.verse_num,
         |  FLOOR(verse_start_raw * 100 + 0.5) / 100 AS verse_start,
         |  FLOOR((verse_start_raw + verse_dur) * 100 + 0.5) / 100 AS verse_end,
         |  v.word_idx AS wpos, v.word,
         |  FLOOR((verse_start_raw + v.word_idx * (verse_dur / cum.n_words))
         |    * 100 + 0.5) / 100 AS start,
         |  FLOOR((verse_start_raw + (v.word_idx + 1) * (verse_dur / cum.n_words))
         |    * 100 + 0.5) / 100 AS "end",
         |  CAST(0.1 AS DOUBLE) AS confidence
         |FROM v
         |JOIN cum USING (book, chapter, verse_num)
         |ORDER BY book, chapter, verse_num, wpos""".stripMargin,

    "q82_align_estimated_sql" ->
      s"""WITH w AS (
         |  SELECT 'b' || CAST(doc_id % 5 AS VARCHAR) AS book,
         |    CAST((doc_id // 5) % 10 + 1 AS INTEGER) AS chapter,
         |    generate_subscripts(toks, 1) - 1 AS pos,
         |    unnest(toks) AS word
         |  FROM (
         |    SELECT doc_id, list_filter(string_split(
         |      translate(lower(text), '$latin', '$hebrew'), ' '),
         |      x -> x <> '') AS toks
         |    FROM documents WHERE doc_id < 50)),
         |v AS (
         |  SELECT book, chapter, pos, word,
         |    CAST(pos // 8 + 1 AS INTEGER) AS verse_num,
         |    CAST(pos % 8 AS INTEGER) AS word_idx
         |  FROM w),
         |dur AS (
         |  SELECT book, chapter, COUNT(*) * 0.5 + 2.0 AS duration,
         |    COUNT(DISTINCT CAST(pos // 8 + 1 AS INTEGER)) AS n_verses
         |  FROM w GROUP BY book, chapter),
         |vs AS (
         |  SELECT book, chapter, verse_num, COUNT(*) AS n_words
         |  FROM v GROUP BY book, chapter, verse_num)
         |SELECT v.book, v.chapter, v.verse_num, v.word_idx, v.word,
         |  FLOOR((v.verse_num - 1) * (duration / n_verses) * 100 + 0.5) / 100 AS v_start,
         |  FLOOR(((v.verse_num - 1) * (duration / n_verses) + duration / n_verses) * 100 + 0.5) / 100 AS v_end,
         |  FLOOR(((v.verse_num - 1) * (duration / n_verses) + v.word_idx * (duration / n_verses / n_words)) * 100 + 0.5) / 100 AS w_start,
         |  FLOOR(((v.verse_num - 1) * (duration / n_verses) + (v.word_idx + 1) * (duration / n_verses / n_words)) * 100 + 0.5) / 100 AS w_end
         |FROM v
         |JOIN dur USING (book, chapter)
         |JOIN vs USING (book, chapter, verse_num)
         |ORDER BY book, chapter, verse_num, word_idx""".stripMargin)
}
