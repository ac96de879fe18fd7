package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** ST4: file-arrival processing — the reference's recommended deployment
  * (trigger on blob upload, handovernote-v1.txt:43) as a Structured
  * Streaming file source: new transcription payload files appear in a
  * directory, stream through provider normalization + alignment, and land
  * as per-chapter JSON via `foreachBatch`.
  *
  * ST3's rate limiting maps to `maxFilesPerTrigger`; ST2's poll cadence
  * to `Trigger.ProcessingTime`.
  */
object ChapterFileStream {

  /** Source: one row per arriving payload file. Filename convention
    * `{book}_{chapter}.json`; payload is the whole file (wholetext).
    */
  def payloadStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .withColumn("file", input_file_name())
      .withColumn("book",
        regexp_extract(col("file"), "([A-Za-z0-9]+)_\\d+\\.json$", 1))
      .withColumn("chapter",
        regexp_extract(col("file"), "_(\\d+)\\.json$", 1).cast("int"))
      .select(col("book"), col("chapter"), col("value").as("payload"))

  /** Sink: run `process` on each micro-batch (alignment is a batch
    * transform — foreachBatch bridges it into streaming).
    */
  def start(payloads: DataFrame, trigger: Trigger,
      checkpoint: String)(process: (DataFrame, Long) => Unit)
  : StreamingQuery =
    payloads.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        process(batch.toDF(), id)
      }
      .start()
}
