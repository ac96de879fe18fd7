package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P12: duration-sanity validation of alignment outputs against source
  * audio durations — the reference's post-alignment QA gate, run on
  * every chapter it writes.
  *
  * Reference semantics:
  *  - `hebrew_alignment_tool.py:405-415` (`_validate_output`): reject
  *    when `total_duration > audio_duration * 1.1` — the strict gate.
  *  - `fixed_hebrew_aligner.py:580-600`: the lenient gate — reject when
  *    there are no verses, when `overall_confidence < 0.1`, or when
  *    `total_duration > audio_duration * 1.2`.
  *
  * Shape: ONE equi-join on the chapter key (broadcast-able when the
  * audio-duration catalog is the small side; hash otherwise — AQE
  * decides), then row-local arithmetic. No extra shuffle, no collect;
  * at 100 TB this is a map-side stamp over the alignment output.
  */
object DurationSanity {

  /** Join `aligned` (per-chapter rollups) to `audio` (per-chapter
    * durations) on `keys` and stamp each chapter with:
    *  - `duration_ratio` — total/audio, floor-portable 4-dp rounding
    *  - `valid_strict`  — the ×`strictFactor` (default 1.1) gate
    *  - `valid_lenient` — verses present AND confidence ≥ 0.1 AND the
    *    ×`lenientFactor` (default 1.2) gate
    */
  def validate(aligned: DataFrame, audio: DataFrame, keys: Seq[String],
      totalDurCol: String, confidenceCol: String, verseCountCol: String,
      audioDurCol: String, strictFactor: Double = 1.1,
      lenientFactor: Double = 1.2): DataFrame = {
    aligned.join(audio, keys)
      .withColumn("duration_ratio",
        floor(col(totalDurCol) / col(audioDurCol) * 10000 + 0.5) / 10000)
      .withColumn("valid_strict",
        col(totalDurCol) <= col(audioDurCol) * strictFactor)
      .withColumn("valid_lenient",
        col(verseCountCol) > 0 &&
          col(confidenceCol) >= 0.1 &&
          col(totalDurCol) <= col(audioDurCol) * lenientFactor)
  }
}
