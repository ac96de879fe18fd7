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
