package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.audio.AudioOps

/** Audio-trimmer operator surface (SURVEY.md §2: A6-A8, X15, §1.6 state
  * table) exercised over the synthetic tables: the keyed-state upsert and
  * trim statistics have exact DuckDB oracles; the full trim-suggestion
  * pipeline (synthesized PCM → RMS segments → threshold → suggestion) is
  * rows-only (ARRAY<FLOAT> synthesis differs per engine).
  */
object AudioQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_fuzzy_native" -> ((s, d) => fuzzyNative(s, d)),

    // §1.6: trim-config upsert — latest record per key wins.
    "q66_config_upsert" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(concat(col("user_id"), lit(":"), col("event_type"))
          .as("key"),
          col("value"), col("event_id").as("ts"))
      val existing = ev.filter(col("ts") % 2 === 0)
      val updates = ev.filter(col("ts") % 2 === 1)
      AudioOps.upsertConfig(existing, updates)
        .orderBy("key")
    }),

    // §1.6: both trim-config record shapes (range + by_length) through
    // one keyed upsert — newer by_length updates overwrite range records
    // per key — then the canonical range view of the merged config.
    "q86_trim_bylength" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(concat(lit("doc_"), col("doc_id")).as("key"),
          col("doc_id"),
          (col("n_chars").cast("double") / 100.0).as("orig"))
      val existing = base.select(col("key"),
        lit(null).cast("string").as("trim_method"),
        lit(null).cast("string").as("trim_from"),
        lit(null).cast("double").as("keep_duration"),
        ((col("doc_id") % 10) * 0.5).as("trim_start"),
        when(col("doc_id") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("orig") * 0.8).as("trim_end"),
        col("orig").as("original_duration"),
        (col("orig") - (col("doc_id") % 10) * 0.5).as("new_duration"),
        col("doc_id").as("ts"))
      val updates = base.filter(col("doc_id") % 2 === 0)
        .select(col("key"), lit("by_length").as("trim_method"),
          when(col("doc_id") % 4 === 0, "start").otherwise("end")
            .as("trim_from"),
          (col("orig") * 0.6).as("keep_duration"),
          lit(null).cast("double").as("trim_start"),
          lit(null).cast("double").as("trim_end"),
          col("orig").as("original_duration"),
          (col("orig") * 0.6).as("new_duration"),
          (col("doc_id") + 1000000).as("ts"))
      AudioOps.byLengthAsRange(AudioOps.upsertConfig(existing, updates))
        .orderBy("key")
    }),

    // A8: trim statistics over a config derived from events.
    "q67_trim_stats" -> ((s, d) => {
      val config = Tables.events(s, d)
        .select((col("value") / 100.0).as("trim_start"),
          col("value").as("original_duration"),
          (col("value") * 0.9).as("new_duration"))
      AudioOps.trimStats(config)
    }),

    // A6/A7/X15 pipeline on synthesized per-doc PCM: quiet intro length
    // derived from n_chars, then loud alternating samples; the trimmer
    // must find the intro boundary. Oracle: closed-form per-segment RMS
    // (q quiet + 200−q loud samples per 200-sample segment) — the
    // engine's sequential fold and the closed form differ only by
    // summation-order ulps, far below every threshold margin, and the
    // OUTPUT is quantized to exact decimals ((firstLoud−1)·2 − 0.5).
    "q65_trim_suggest" -> ((s, d) => {
      val sr = 100
      val quietLen = (col("n_chars") % 300 + 100).cast("int")
      val totalLen = lit(1000)
      val samples = transform(sequence(lit(0), totalLen - 1), i =>
        when(i < quietLen, lit(0.01f))
          .otherwise(when(i % 2 === 0, lit(0.8f)).otherwise(lit(-0.8f))))
      Tables.documents(s, d)
        .select(col("doc_id"), samples.as("samples"))
        .select(col("doc_id"),
          AudioOps.suggestTrim(
            AudioOps.rmsSegmentsInline(col("samples"), sr)).as("suggested"),
          size(AudioOps.trimSamples(col("samples"), sr,
            lit(1.0), lit(8.0))).as("trimmed_len"))
        .orderBy("doc_id")
    })
  )

  /** X14 native expressions over adjacent part names — codegen'd
    * Catalyst expressions, no UDFs. Fully oracle-checked: DuckDB has no
    * LCS/indel builtin, but [[FuzzySql]] renders the same bit-parallel
    * LCS recurrence the kernels run as a list_reduce fold, so all four
    * ratio columns (indel, partial, token_set, token_sort) compare
    * bit-exactly; kernel fidelity is additionally covered by
    * FuzzySpec/FuzzyExprSpec goldens.
    */
  val fuzzyNative: (SparkSession, String) => DataFrame = (s, d) => {
    import graft.functions.GraftFunctions._
    val p1 = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
    val p2 = Tables.part(s, d).select(
      (col("p_partkey") - 1).as("p_partkey"), col("p_name").as("next_name"))
    p1.join(p2, Seq("p_partkey"))
      .select(col("p_partkey"),
        round(indel_ratio(col("p_name"), col("next_name")), 4).as("indel"),
        round(partial_ratio(col("p_name"), col("next_name")), 4)
          .as("partial"),
        round(token_set_ratio(col("p_name"), col("next_name")), 4)
          .as("token_set"),
        round(token_sort_ratio(col("p_name"), col("next_name")), 4)
          .as("token_sort"))
      .orderBy("p_partkey")
  }

  /** q68: all four fuzzy kernels re-derived in SQL over the same
    * adjacent-part-name pairs. `array_to_string` of an empty list is
    * NULL in DuckDB (Scala mkString gives ""), hence the coalesces; the
    * token_set t1/t2 assembly mirrors Fuzzy.tokenSetRatio's
    * empty-handling exactly. No stripMargin: the LCS folds contain
    * literal `|` bitwise operators.
    */
  private def fuzzyOracle: String = {
    import FuzzySql.{partialExpr, ratioExpr, sortedToks}
    s"""WITH pairs AS (
         SELECT p1.p_partkey, p1.p_name AS a, p2.p_name AS b
         FROM part p1 JOIN part p2 ON p2.p_partkey = p1.p_partkey + 1),
       tokenized AS (
         SELECT p_partkey, a, b,
           coalesce(array_to_string(${sortedToks("a")}, ' '), '')
             AS sorted_a,
           coalesce(array_to_string(${sortedToks("b")}, ' '), '')
             AS sorted_b,
           list_distinct(${sortedToks("a")}) AS ta,
           list_distinct(${sortedToks("b")}) AS tb
         FROM pairs),
       setparts AS (
         SELECT p_partkey, a, b, sorted_a, sorted_b,
           coalesce(array_to_string(list_sort(list_filter(ta,
             x -> list_contains(tb, x))), ' '), '') AS inter,
           coalesce(array_to_string(list_sort(list_filter(ta,
             x -> NOT list_contains(tb, x))), ' '), '') AS diff_a,
           coalesce(array_to_string(list_sort(list_filter(tb,
             x -> NOT list_contains(ta, x))), ' '), '') AS diff_b
         FROM tokenized),
       sets AS (
         SELECT p_partkey, a, b, sorted_a, sorted_b, inter,
           CASE WHEN diff_a = '' THEN inter
                WHEN inter = '' THEN diff_a
                ELSE inter || ' ' || diff_a END AS t1,
           CASE WHEN diff_b = '' THEN inter
                WHEN inter = '' THEN diff_b
                ELSE inter || ' ' || diff_b END AS t2
         FROM setparts)
       SELECT p_partkey,
         round(${ratioExpr("a", "b")}, 4) AS indel,
         round(${partialExpr("a", "b")}, 4) AS "partial",
         round(greatest(${ratioExpr("inter", "t1")},
           greatest(${ratioExpr("inter", "t2")},
                    ${ratioExpr("t1", "t2")})), 4) AS token_set,
         round(${ratioExpr("sorted_a", "sorted_b")}, 4) AS token_sort
       FROM sets
       ORDER BY p_partkey"""
  }

  def oracle: Map[String, String] = Map(
    "q68_fuzzy_native" -> fuzzyOracle,

    "q66_config_upsert" ->
      """SELECT key, value, ts FROM (
        |  SELECT user_id || ':' || event_type AS key, value,
        |    event_id AS ts,
        |    row_number() OVER (
        |      PARTITION BY user_id || ':' || event_type
        |      ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY key""".stripMargin,

    "q65_trim_suggest" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars % 300 + 100 AS q FROM documents),
        |c AS (
        |  SELECT CAST(CAST(0.01 AS REAL) AS DOUBLE) AS qv,
        |         CAST(CAST(0.8 AS REAL) AS DOUBLE) AS lv),
        |seg AS (
        |  SELECT doc_id, s.s,
        |    sqrt((LEAST(GREATEST(q - s.s * 200, 0), 200) * qv * qv +
        |          (200 - LEAST(GREATEST(q - s.s * 200, 0), 200)) * lv * lv)
        |         / 200) AS rms
        |  FROM d, (SELECT unnest([0, 1, 2, 3, 4]) AS s) s, c),
        |thr AS (
        |  SELECT doc_id,
        |    SUM(rms) FILTER (WHERE s >= 2) / 3 * 0.3 AS thr
        |  FROM seg GROUP BY doc_id),
        |first AS (
        |  SELECT seg.doc_id, MIN(s) + 1 AS first_loud
        |  FROM seg JOIN thr USING (doc_id)
        |  WHERE rms > thr.thr GROUP BY seg.doc_id)
        |SELECT d.doc_id,
        |  GREATEST(CAST(0.0 AS DOUBLE),
        |    CAST(first_loud - 1 AS DOUBLE) * 2.0 - 0.5) AS suggested,
        |  CAST(700 AS INTEGER) AS trimmed_len
        |FROM d LEFT JOIN first USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q86_trim_bylength" ->
      """WITH base AS (
        |  SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS key, doc_id,
        |    CAST(n_chars AS DOUBLE) / 100.0 AS orig
        |  FROM documents),
        |existing AS (
        |  SELECT key, CAST(NULL AS VARCHAR) AS trim_method,
        |    CAST(NULL AS VARCHAR) AS trim_from,
        |    CAST(NULL AS DOUBLE) AS keep_duration,
        |    CAST(doc_id % 10 AS DOUBLE) * 0.5 AS trim_start,
        |    CASE WHEN doc_id % 3 = 0 THEN CAST(NULL AS DOUBLE)
        |         ELSE orig * 0.8 END AS trim_end,
        |    orig AS original_duration,
        |    orig - CAST(doc_id % 10 AS DOUBLE) * 0.5 AS new_duration,
        |    doc_id AS ts
        |  FROM base),
        |updates AS (
        |  SELECT key, 'by_length' AS trim_method,
        |    CASE WHEN doc_id % 4 = 0 THEN 'start' ELSE 'end' END
        |      AS trim_from,
        |    orig * 0.6 AS keep_duration,
        |    CAST(NULL AS DOUBLE) AS trim_start,
        |    CAST(NULL AS DOUBLE) AS trim_end,
        |    orig AS original_duration,
        |    orig * 0.6 AS new_duration,
        |    doc_id + 1000000 AS ts
        |  FROM base WHERE doc_id % 2 = 0),
        |merged AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY key ORDER BY ts DESC) AS rn
        |    FROM (SELECT * FROM existing UNION ALL SELECT * FROM updates))
        |  WHERE rn = 1)
        |SELECT key, trim_method, trim_from, keep_duration, trim_start,
        |  trim_end, original_duration, new_duration, ts,
        |  CASE WHEN trim_method = 'by_length' THEN
        |    CASE WHEN trim_from = 'start'
        |         THEN original_duration - keep_duration
        |         ELSE CAST(0.0 AS DOUBLE) END
        |  ELSE trim_start END AS eff_trim_start,
        |  CASE WHEN trim_method = 'by_length' THEN
        |    CASE WHEN trim_from = 'start' THEN original_duration
        |         ELSE keep_duration END
        |  ELSE trim_end END AS eff_trim_end
        |FROM merged ORDER BY key""".stripMargin,

    "q67_trim_stats" ->
      """SELECT COUNT(*) AS n_trims,
        |  ROUND(SUM(value / 100.0 +
        |    (value - value * 0.9 - value / 100.0)), 2) AS total_saved_sec,
        |  ROUND(AVG(value / 100.0), 4) AS avg_trim_start
        |FROM events""".stripMargin
  )
}
