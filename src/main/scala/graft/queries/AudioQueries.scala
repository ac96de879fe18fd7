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
    // must find the intro boundary. Rows-only.
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
    * Catalyst expressions, no UDFs (rows-only: no DuckDB LCS analog;
    * kernel fidelity is covered by FuzzySpec/FuzzyExprSpec goldens).
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

  def oracle: Map[String, String] = Map(
    "q66_config_upsert" ->
      """SELECT key, value, ts FROM (
        |  SELECT user_id || ':' || event_type AS key, value,
        |    event_id AS ts,
        |    row_number() OVER (
        |      PARTITION BY user_id || ':' || event_type
        |      ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY key""".stripMargin,

    "q67_trim_stats" ->
      """SELECT COUNT(*) AS n_trims,
        |  ROUND(SUM(value / 100.0 +
        |    (value - value * 0.9 - value / 100.0)), 2) AS total_saved_sec,
        |  ROUND(AVG(value / 100.0), 4) AS avg_trim_start
        |FROM events""".stripMargin
  )
}
