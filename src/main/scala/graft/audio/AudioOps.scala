package graft.audio

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Audio trimmer operators (scripts/hebrew_audio_trimmer.py): RMS energy
  * segmentation (A6), intro-threshold detection (A7), sample-slice trim
  * (X15), and the trim-config keyed state table (§1.6).
  *
  * Samples are `ARRAY<FLOAT>` columns (decoded PCM); all analysis is
  * declarative — higher-order functions + aggregation, no UDFs — so a
  * corpus-wide trim analysis is one shuffle-free scan per file row plus
  * one small aggregate.
  */
object AudioOps {

  /** A6: per-segment RMS over fixed windows of `segSeconds` at
    * `sampleRate` (hebrew_audio_trimmer.py:113-124). One row per
    * (file, segment) via posexplode; the groupBy keys on (path, segment)
    * — partial aggregation makes this a single map-side-combined pass.
    */
  def rmsSegments(df: DataFrame, samplesCol: String, pathCol: String,
      sampleRate: Int, segSeconds: Double = 2.0): DataFrame = {
    val segLen = (sampleRate * segSeconds).toInt
    df.select(col(pathCol).as("path"),
        posexplode(col(samplesCol)).as(Seq("idx", "x")))
      .groupBy(col("path"), (col("idx") / segLen).cast("long").as("segment"))
      .agg(sqrt(avg(col("x") * col("x"))).as("rms"),
        count(lit(1)).as("n_samples"))
  }

  /** A6 one-pass variant: RMS per segment computed inside the array via
    * HOFs — no explode, no shuffle at all. Preferred at scale: the
    * 100 TB plan keeps one row per file and computes the whole segment
    * vector in a single projection.
    */
  def rmsSegmentsInline(samples: Column, sampleRate: Int,
      segSeconds: Double = 2.0): Column = {
    val segLen = lit((sampleRate * segSeconds).toInt)
    val nSegs = ceil(size(samples) / segLen.cast("double")).cast("int")
    transform(sequence(lit(0), nSegs - 1), seg => {
      val segment = slice(samples, seg * segLen + 1, segLen)
      sqrt(aggregate(segment, lit(0.0d),
        (acc, v) => acc + v.cast("double") * v.cast("double"))
        / size(segment))
    })
  }

  /** A7: intro-trim suggestion (hebrew_audio_trimmer.py:127-140):
    * threshold = 0.3 × mean RMS of segments ≥ 2; suggested trim =
    * max(0, first-exceed segment start − 0.5 s). Null when no segment
    * exceeds the threshold.
    */
  def suggestTrim(rmsCol: Column, segSeconds: Double = 2.0): Column =
    // Bind the RMS vector and the threshold once as lambda variables
    // (single-element transform). `thr` referenced directly inside the
    // per-element compare would re-run the whole mean fold for every
    // segment — HOF lambdas get no common-subexpression elimination —
    // turning an O(nSegs) scan into O(nSegs²): real money on hour-long
    // audio (1800 segments), and worse when rmsCol is itself the inline
    // RMS pipeline rather than a materialized column.
    element_at(transform(array(rmsCol), rms => {
      val tail = filter(rms, (_, i) => i >= 2)
      val thrExpr = aggregate(tail, lit(0.0d), (acc, v) => acc + v,
        acc => acc / greatest(size(tail), lit(1))) * 0.3
      element_at(transform(array(thrExpr), thr => {
        val firstLoud = array_position(
          transform(rms, v => v > thr), true)
        when(firstLoud > 0,
          greatest(lit(0.0), (firstLoud - 1) * segSeconds - 0.5))
          .otherwise(lit(null).cast("double"))
      }), 1)
    }), 1)

  /** X15: slice samples to [trimStart, end) seconds with index clamping
    * (hebrew_audio_trimmer.py:167-181).
    */
  def trimSamples(samples: Column, sampleRate: Int, trimStart: Column,
      trimEnd: Column): Column = {
    val n = size(samples)
    val startIdx = least(greatest(
      (trimStart * sampleRate).cast("int"), lit(0)), n)
    val endIdx = least(greatest(
      (trimEnd * sampleRate).cast("int"), startIdx), n)
    slice(samples, startIdx + 1, endIdx - startIdx)
  }

  /** §1.6: trim-config keyed state upsert — read ∪ new → keep latest per
    * key (row_number over timestamp desc). The Spark-native MERGE:
    * one shuffle on the key, idempotent overwrite semantics.
    */
  def upsertConfig(existing: DataFrame, updates: DataFrame,
      keyCol: String = "key", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc)
    existing.unionByName(updates, allowMissingColumns = true)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** §1.6 alternate record shape: the trimmer writes TWO record types
    * under one config key space — range records {trim_start, trim_end?}
    * (hebrew_audio_trimmer.py:186-194) and by_length records
    * {trim_method:'by_length', keep_duration, trim_from}
    * (hebrew_audio_trimmer.py:252-260). The union schema travels with
    * nullable columns (upsertConfig's unionByName handles the missing
    * ones); this derives the canonical range view: trim_from='start'
    * keeps the LAST keep_duration seconds (start = original − keep,
    * end = original), 'end' keeps the FIRST (start = 0, end = keep).
    */
  def byLengthAsRange(config: DataFrame): DataFrame =
    config
      .withColumn("eff_trim_start",
        when(col("trim_method") === "by_length",
          when(col("trim_from") === "start",
            col("original_duration") - col("keep_duration"))
            .otherwise(lit(0.0)))
          .otherwise(col("trim_start")))
      .withColumn("eff_trim_end",
        when(col("trim_method") === "by_length",
          when(col("trim_from") === "start", col("original_duration"))
            .otherwise(col("keep_duration")))
          .otherwise(col("trim_end")))

  /** A8: trim statistics (hebrew_audio_trimmer.py:504-527). */
  def trimStats(config: DataFrame): DataFrame =
    config.agg(
      count(lit(1)).as("n_trims"),
      round(sum(coalesce(col("trim_start"), lit(0.0)) +
        coalesce(col("original_duration") - col("new_duration") -
          coalesce(col("trim_start"), lit(0.0)), lit(0.0))), 2)
        .as("total_saved_sec"),
      round(avg(col("trim_start")), 4).as("avg_trim_start"))
}
