package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.CurationOps

/** Driver-gate wiring for the corpus-curation operators
  * (`ops/CurationOps`): benchmark decontamination, repetition-quality
  * rules, PII-style redaction, stratified mixture sampling, column
  * profiling, vocabulary building. Every query has an exact DuckDB
  * oracle.
  *
  * These generalize the reference's data-hygiene passes (duration
  * sanity, confidence floors, Hebrew-char checks —
  * hebrew_alignment_transcription_fixed.py:505-519) to the checks a
  * 100 TB pre-training pipeline runs before shipping shards.
  */
object Curation {

  // Deterministic benchmark membership: a pure function of doc_id, so
  // the eval set is stable across runs/engines (stand-in for a real
  // held-out benchmark table, which would be its own small input).
  private val benchmarkPred: Column = col("doc_id") % 19 === 0

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q98_decontaminate" -> ((s, d) => {
      CurationOps.decontaminate(Tables.documents(s, d), "text", "doc_id",
        benchmarkPred, minShared = 3, flagAt = 8)
        .orderBy("doc_id")
    }),

    "q99_repetition_stats" -> ((s, d) => {
      CurationOps.repetitionStats(Tables.documents(s, d), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // Digit runs in the events props payload stand in for the PII
    // patterns (ids, phone numbers) a real scrub pass masks.
    "q100_pii_scrub" -> ((s, d) => {
      CurationOps.redact(Tables.events(s, d), "props")
        .select(col("event_id"), col("n_redacted"), col("scrubbed"))
        .orderBy("event_id")
    }),

    // Per-language mixture rates: en downsampled hard (overrepresented),
    // zh kept at half, everything else at a quarter.
    "q101_stratified_sample" -> ((s, d) => {
      val sampled = CurationOps.stratifiedSampleFlag(col("lang"),
        col("doc_id"), Map("en" -> 10, "zh" -> 50), defaultRate = 25,
        salt = "mix")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), sampled.as("sampled"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(col("sampled").cast("long")).as("n_sampled"))
        .orderBy("lang")
    }),

    "q102_column_profile" -> ((s, d) => {
      CurationOps.columnProfile(Tables.events(s, d),
        Seq("event_id", "user_id", "event_type", "value", "props"))
        .orderBy("col_name")
    }),

    "q103_vocab_topk" -> ((s, d) => {
      CurationOps.vocabTopK(Tables.documents(s, d), "text", 20)
    }),

    // Corpus length distribution per language: exact interpolated
    // percentiles (Spark `percentile` and DuckDB `quantile_cont` are
    // both type-7 — bit-identical results). Exact percentile buffers a
    // group's values; at 100 TB the same query runs with
    // approx_percentile (t-digest, mergeable partial aggs) — exact here
    // so the oracle can hash-match.
    // Winnowed rolling-hash fingerprints: the edit-robust document
    // fingerprint (shared k-gram minima survive local edits). The gate
    // carries the set size + md5 of the sorted set, not the set itself.
    // One winnow evaluation feeds both output columns via a struct
    // bound in a single lambda (two bare column refs would re-derive
    // the whole fingerprint pipeline each).
    "q108_winnow_fingerprints" -> ((s, d) => {
      import graft.functions.TextFunctions
      val fpStruct = element_at(transform(
        array(TextFunctions.winnowedFingerprints(col("text"))), ws =>
          struct(size(ws).as("n_fp"),
            md5(array_join(array_sort(ws), ",")).as("fp_md5"))), 1)
      Tables.documents(s, d)
        .select(col("doc_id"), fpStruct.as("s"))
        .select(col("doc_id"), col("s.n_fp").as("n_fp"),
          col("s.fp_md5").as("fp_md5"))
        .orderBy("doc_id")
    }),

    // Winnow-fingerprint near-dup pairs. Ubiquitous fingerprints
    // (df > cap) are stop-grams dropped BEFORE pair generation —
    // without the cap a template-corpus fingerprint shared by m docs
    // contributes m²/2 candidate rows (measured 8.7k pairs uncapped vs
    // 22 discriminative ones here). Shape: ONE documents scan feeding a
    // single groupBy(fp) exchange; collect_list both measures the df
    // (per-doc fps are array_distinct, so size(ids) IS the document
    // frequency) and carries the capped posting list, whose pairs are
    // generated map-side with array HOFs (≤ C(10,2)=45 rows per fp).
    // This replaces the earlier df-window + self-join, whose two join
    // sides re-ran the whole winnow pipeline (no exchange reuse
    // pre-AQE) — plan-gated in PlanRegressionSpec to one scan.
    "q109_winnow_neardup" -> ((s, d) => {
      import graft.functions.TextFunctions
      val fps = Tables.documents(s, d).select(col("doc_id"),
        explode(TextFunctions.winnowedFingerprints(col("text"))).as("fp"))
      val groups = fps.groupBy(col("fp"))
        .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, 10))
      // all (i < j) pairs of the sorted posting list; ids are distinct,
      // so sorted order gives id1 < id2 directly
      val pairs = groups.select(explode(flatten(transform(col("ids"),
        (x, i) => transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id1"), y.as("id2")))))).as("p"))
      pairs.groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5)
        .orderBy("id1", "id2")
    }),

    // Budget-derived mixture: per-language keep-rates computed FROM the
    // data (cap each language at ~20k sampled-eligible tokens) instead
    // of q101's fixed rates — the rebalancing pass a training mixture
    // actually runs. Integer rate arithmetic keeps both engines exact.
    "q110_token_budget_mix" -> ((s, d) => {
      import graft.functions.TextFunctions
      val base = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      CurationOps.tokenBudgetSampleFlag(base, col("lang"), col("n_tok"),
        col("doc_id"), tokenBudget = 20000L, salt = "budget")
        .groupBy(col("lang"))
        .agg(max(col("_rate_ppm")).as("rate_ppm"),
          sum(col("n_tok")).as("total_tokens"),
          sum(when(col("sampled"), col("n_tok")).otherwise(0L))
            .as("sampled_tokens"),
          sum(col("sampled").cast("long")).as("n_sampled"))
        .orderBy("lang")
    }),

    // Exact-k sampling: exactly min(k, |stratum|) docs per language,
    // membership a pure function of the salted hash order (rate-based
    // sampling can only approximate counts). One shuffle on the stratum
    // key; rows_number over the md5 order with a doc_id tie-break keeps
    // the pick total-ordered and engine-portable. At 100 TB strata the
    // same shape runs after a cheap rate-based pre-filter (sample ~2k
    // candidates, then rank) so the window never sees the full stratum.
    "q111_exact_k_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = md5(concat(lit("pick:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 30)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    }),

    "q105_length_percentiles" -> ((s, d) => {
      import graft.functions.TextFunctions
      Tables.documents(s, d)
        .select(col("lang"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n"))
        .groupBy("lang")
        .agg(round(percentile(col("n"), lit(0.5)), 4).as("p50"),
          round(percentile(col("n"), lit(0.9)), 4).as("p90"),
          round(percentile(col("n"), lit(0.99)), 4).as("p99"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    // q98's semantics through the bloom-prefilter path — result-identical
    // by construction (exact-verify tail), so it shares q98's oracle.
    // The variant for a benchmark suite too big to broadcast exactly:
    // ~7.3 bits/gram sketch + codegen'd scan predicate instead of an
    // exact broadcast set.
    "q128_decontaminate_bloom" -> ((s, d) => {
      CurationOps.decontaminateBloom(Tables.documents(s, d), "text",
        "doc_id", benchmarkPred, minShared = 3, flagAt = 8,
        expectedBenchGrams = 1L << 16)
        .orderBy("doc_id")
    }),

    // q98's semantics with the broadcast-vs-bloom regime AUTO-selected
    // (the default path a caller who knows neither variant gets): on
    // gate data the estimator picks broadcast, at the measured 4M-doc
    // boundary it picks bloom — results identical either way, so it
    // shares q98's oracle verbatim.
    "q134_decontaminate_auto" -> ((s, d) => {
      CurationOps.decontaminateAuto(Tables.documents(s, d), "text",
        "doc_id", benchmarkPred, minShared = 3, flagAt = 8)
        .orderBy("doc_id")
    }),

    // SUBSTRING-level dedup: cross-document repeated-span removal
    // (runs of ≥5 tokens shared with an earlier doc get trimmed, the
    // doc survives) — the boilerplate pass document-granularity dedup
    // can't express. Gate carries per-doc span stats AND the cleaned
    // text itself, so the interval merge and the reconstruction are
    // both hash-checked.
    "q147_span_dedup" -> ((s, d) => {
      CurationOps.spanDedup(Tables.documents(s, d), "doc_id", "text",
        k = 5)
        .orderBy("doc_id")
    })
  )

  /** Shared winnow-fingerprint derivation (q108 reports it; q109 joins
    * on it) — mirrors `TextFunctions.winnowedFingerprints` defaults.
    */
  private def winnowCte: String = {
    val k = 8; val w = 4
    val pows: Seq[Long] = {
      var p = 1L
      (0 until k).map { _ => val r = p; p = p * 256L % 1000000007L; r }
        .reverse
    }
    val hashTerm = pows.zipWithIndex.map { case (p, j) =>
      s"codes[i + $j] * $p" }.mkString(" + ")
    s"""nrm AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
       |  FROM documents),
       |coded AS (
       |  SELECT doc_id,
       |    list_transform(range(1, length(s) + 1),
       |      i -> CAST(unicode(substring(s, i, 1)) AS BIGINT)) AS codes
       |  FROM nrm),
       |hashed AS (
       |  SELECT doc_id,
       |    CASE WHEN len(codes) >= $k THEN
       |      list_transform(range(1, len(codes) - ${k - 1} + 1),
       |        i -> ($hashTerm) % 1000000007)
       |    ELSE [] END AS hs
       |  FROM coded),
       |winnowed AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hs) = 0 THEN []
       |         WHEN len(hs) < $w THEN [list_min(hs)]
       |         ELSE list_distinct(list_transform(
       |           range(1, len(hs) - ${w - 1} + 1),
       |           i -> list_min(hs[i : i + ${w - 1}])))
       |    END AS ws
       |  FROM hashed)""".stripMargin
  }

  def oracle: Map[String, String] = Map(

    "q98_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
        |  FROM tok),
        |bench AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 19 = 0),
        |corpus AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 19 <> 0)
        |SELECT doc_id, count(*) AS n_shared, count(*) >= 8 AS contaminated
        |FROM corpus JOIN bench USING (gram)
        |GROUP BY doc_id HAVING count(*) >= 3
        |ORDER BY doc_id""".stripMargin,

    // identical SQL to q98 on purpose: the bloom path is a pure
    // prefilter (exact-verify tail) — the oracle asserts the bloom
    // variant computes EXACTLY the broadcast variant's answer
    "q128_decontaminate_bloom" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
        |  FROM tok),
        |bench AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 19 = 0),
        |corpus AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 19 <> 0)
        |SELECT doc_id, count(*) AS n_shared, count(*) >= 8 AS contaminated
        |FROM corpus JOIN bench USING (gram)
        |GROUP BY doc_id HAVING count(*) >= 3
        |ORDER BY doc_id""".stripMargin,

    // identical SQL to q98/q128 on purpose: the auto path picks a
    // PHYSICAL regime; the answer is regime-invariant by construction
    "q134_decontaminate_auto" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
        |  FROM tok),
        |bench AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE doc_id % 19 = 0),
        |corpus AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE doc_id % 19 <> 0)
        |SELECT doc_id, count(*) AS n_shared, count(*) >= 8 AS contaminated
        |FROM corpus JOIN bench USING (gram)
        |GROUP BY doc_id HAVING count(*) >= 3
        |ORDER BY doc_id""".stripMargin,

    "q99_repetition_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, len(t) AS n_tok, len(list_distinct(t)) AS n_dist
        |  FROM tok),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS g
        |  FROM tok WHERE len(t) >= 2),
        |cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
        |mx AS (SELECT doc_id, max(c) AS max_bg FROM cnt GROUP BY 1),
        |frac AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tok > 0
        |      THEN ROUND(1.0 - n_dist / CAST(n_tok AS DOUBLE), 4)
        |      ELSE 0.0 END AS dup_token_frac,
        |    CASE WHEN n_tok >= 2
        |      THEN ROUND(COALESCE(max_bg, 0) / CAST(n_tok - 1 AS DOUBLE), 4)
        |      ELSE 0.0 END AS top_bigram_frac
        |  FROM base LEFT JOIN mx USING (doc_id))
        |SELECT doc_id, dup_token_frac, top_bigram_frac,
        |  (dup_token_frac > 0.6 OR top_bigram_frac > 0.08) AS repetitive
        |FROM frac ORDER BY doc_id""".stripMargin,

    "q100_pii_scrub" ->
      """SELECT event_id,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_redacted,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS scrubbed
        |FROM events ORDER BY event_id""".stripMargin,

    "q101_stratified_sample" ->
      """SELECT lang, count(*) AS n_total,
        |  CAST(SUM(CASE WHEN
        |      CAST('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
        |        AS BIGINT) % 100 <
        |      CASE WHEN lang = 'en' THEN 10
        |           WHEN lang = 'zh' THEN 50 ELSE 25 END
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q102_column_profile" ->
      """SELECT 'event_id' AS col_name, count(*) - count(event_id) AS n_nulls,
        |  count(DISTINCT event_id) AS n_distinct FROM events
        |UNION ALL SELECT 'user_id', count(*) - count(user_id),
        |  count(DISTINCT user_id) FROM events
        |UNION ALL SELECT 'event_type', count(*) - count(event_type),
        |  count(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'value', count(*) - count("value"),
        |  count(DISTINCT "value") FROM events
        |UNION ALL SELECT 'props', count(*) - count(props),
        |  count(DISTINCT props) FROM events
        |ORDER BY col_name""".stripMargin,

    "q103_vocab_topk" ->
      """SELECT tok AS token, count(*) AS n
        |FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |  x -> x <> '')) AS tok FROM documents)
        |GROUP BY tok ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "q108_winnow_fingerprints" ->
      s"""WITH $winnowCte
         |SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_fp,
         |  md5(array_to_string(list_sort(ws), ',')) AS fp_md5
         |FROM winnowed ORDER BY doc_id""".stripMargin,

    "q109_winnow_neardup" ->
      s"""WITH $winnowCte,
         |fps AS (SELECT doc_id, unnest(ws) AS fp FROM winnowed),
         |freq AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp),
         |flt AS (
         |  SELECT doc_id, f.fp FROM fps f JOIN freq USING (fp)
         |  WHERE df <= 10),
         |p AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_shared
         |  FROM flt a JOIN flt b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2, n_shared FROM p WHERE n_shared >= 5
         |ORDER BY id1, id2""".stripMargin,

    // mirrors tokenBudgetSampleFlag's edge handling exactly (r6 ADVICE):
    // a zero/NULL-token stratum keeps rate 10^6 ppm (nothing to budget
    // away), and the rate join is null-safe (IS NOT DISTINCT FROM =
    // Spark's <=>) so a NULL stratum survives like any other group —
    // gate data has no such strata, but operator and oracle agree on
    // them. Rate space is ppm (integer percent floors to 0 past 100×
    // the budget — the 1M-doc capstone failure DOCS_1m_r13 records).
    "q110_token_budget_mix" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |totals AS (
        |  SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |    CAST(CASE WHEN SUM(n_tok) > 0
        |         THEN LEAST(1000000, 20000::BIGINT * 1000000 // SUM(n_tok))
        |         ELSE 1000000 END AS BIGINT) AS rate_ppm
        |  FROM base GROUP BY lang),
        |flagged AS (
        |  SELECT b.lang, b.n_tok, t.rate_ppm, t.total_tokens,
        |    CAST('0x' || substring(md5('budget:' ||
        |      CAST(b.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000
        |      < t.rate_ppm AS sampled
        |  FROM base b JOIN totals t ON b.lang IS NOT DISTINCT FROM t.lang)
        |SELECT lang, MAX(rate_ppm) AS rate_ppm,
        |  MAX(total_tokens) AS total_tokens,
        |  CAST(SUM(CASE WHEN sampled THEN n_tok ELSE 0 END) AS BIGINT)
        |    AS sampled_tokens,
        |  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM flagged GROUP BY lang ORDER BY lang""".stripMargin,

    "q111_exact_k_sample" ->
      """SELECT lang, rk, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('pick:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS rk
        |  FROM documents)
        |WHERE rk <= 30 ORDER BY lang, rk""".stripMargin,

    "q105_length_percentiles" ->
      """SELECT lang,
        |  ROUND(quantile_cont(n, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(n, 0.9), 4) AS p90,
        |  ROUND(quantile_cont(n, 0.99), 4) AS p99,
        |  count(*) AS n_docs
        |FROM (SELECT lang,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS BIGINT) AS n
        |  FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // CurationOps.spanDedup re-derived: positional 5-grams, per-gram
    // min-id ownership, covered-position union (DISTINCT over the
    // k-offset expansion), islands = merged spans (gaps-and-islands
    // via row_number), reconstruction from the uncovered positions.
    // The CASE keeps untouched docs on the normalized-join path and
    // fully-removed docs at '' (string_agg over zero rows is absent →
    // coalesce), exactly the Spark fold's two edges.
    "q147_span_dedup" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, i AS pos,
        |    list_aggregate(t[i : i + 4], 'string_agg', ' ') AS gram
        |  FROM tok, unnest(range(1, len(t) - 4 + 1)) AS u(i)),
        |own AS (SELECT gram, min(doc_id) AS owner FROM g GROUP BY gram),
        |rem AS (
        |  SELECT g.doc_id, g.pos FROM g JOIN own USING (gram)
        |  WHERE g.doc_id > own.owner),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + j AS p
        |  FROM rem, unnest(range(0, 5)) AS u(j)),
        |isl AS (
        |  SELECT doc_id, p,
        |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |  FROM cov),
        |covl AS (
        |  SELECT doc_id, count(*) AS n_removed,
        |    count(DISTINCT grp) AS n_spans
        |  FROM isl GROUP BY doc_id),
        |toksp AS (
        |  SELECT doc_id, i AS p, t[i] AS tk
        |  FROM tok, unnest(range(1, len(t) + 1)) AS u(i)),
        |keptt AS (
        |  SELECT tp.doc_id, tp.p, tp.tk FROM toksp tp
        |  LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.p = tp.p
        |  WHERE cov.p IS NULL),
        |clean AS (
        |  SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS ct
        |  FROM keptt GROUP BY doc_id)
        |SELECT tok.doc_id, len(t) AS n_tok,
        |  coalesce(c.n_spans, 0) AS n_spans,
        |  coalesce(c.n_removed, 0) AS n_removed,
        |  CASE WHEN c.doc_id IS NULL
        |    THEN coalesce(list_aggregate(t, 'string_agg', ' '), '')
        |    ELSE coalesce(cl.ct, '') END AS cleaned_text
        |FROM tok LEFT JOIN covl c USING (doc_id)
        |LEFT JOIN clean cl ON cl.doc_id = tok.doc_id
        |ORDER BY tok.doc_id""".stripMargin
  )
}
