package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.model.TranscribedWord

/** Provider-result normalization (SURVEY.md §1.4): three transcription
  * payload shapes project into the unified `TranscribedWord` row. All
  * declarative — `from_json` + `element_at` (NBest pick, A2) + `explode` +
  * arithmetic (ticks→seconds, P7) + a `row_number` seq (W4).
  */
object TranscriptNormalize {

  /** Whisper word chunks (hebrew_alignment_tool.py:226-237):
    * `{chunks:[{text, timestamp:[start,end]}]}`; null timestamps default
    * to 0.0 / 0.5 (P8); constant confidence 0.8.
    */
  val whisperSchema: StructType = StructType(Seq(
    StructField("chunks", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("timestamp", ArrayType(DoubleType))))))))

  /** Azure local SDK (hebrew_alignment_tool.py:307-324):
    * `{NBest:[{Confidence, Words:[{Word, Offset, Duration, Confidence}]}]}`
    * in 100-ns ticks.
    */
  val azureSdkSchema: StructType = StructType(Seq(
    StructField("NBest", ArrayType(StructType(Seq(
      StructField("Confidence", DoubleType),
      StructField("Words", ArrayType(StructType(Seq(
        StructField("Word", StringType),
        StructField("Offset", LongType),
        StructField("Duration", LongType),
        StructField("Confidence", DoubleType)))))))))))

  /** Azure batch REST (fixed_hebrew_aligner.py:418-440):
    * `{recognizedPhrases:[{nbest:[{confidence, words:[{word,
    * offsetInTicks, durationInTicks}]}]}]}`.
    */
  val azureBatchSchema: StructType = StructType(Seq(
    StructField("recognizedPhrases", ArrayType(StructType(Seq(
      StructField("nbest", ArrayType(StructType(Seq(
        StructField("confidence", DoubleType),
        StructField("words", ArrayType(StructType(Seq(
          StructField("word", StringType),
          StructField("offsetInTicks", LongType),
          StructField("durationInTicks", LongType)))))))))))))))

  private def withSeq(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("book", "chapter")
      .orderBy(col("start"), col("text"))
    df.withColumn("seq", row_number().over(w))
      .select("book", "chapter", "seq", "text", "start", "end", "confidence")
  }

  /** Normalize Whisper payloads: input rows (book, chapter, payload). */
  def fromWhisper(df: DataFrame, payloadCol: String = "payload")
  : DataFrame = withSeq(
    df.select(col("book"), col("chapter"),
        explode(from_json(col(payloadCol), whisperSchema)("chunks"))
          .as("chunk"))
      .select(col("book"), col("chapter"),
        col("chunk.text").as("text"),
        coalesce(element_at(col("chunk.timestamp"), 1), lit(0.0))
          .as("start"),
        coalesce(element_at(col("chunk.timestamp"), 2), lit(0.5)).as("end"),
        lit(0.8).as("confidence")))

  /** Normalize Azure SDK payloads (NBest[0], ticks/1e7). */
  def fromAzureSdk(df: DataFrame, payloadCol: String = "payload")
  : DataFrame = withSeq(
    df.select(col("book"), col("chapter"),
        element_at(from_json(col(payloadCol), azureSdkSchema)("NBest"), 1)
          .as("best"))
      .select(col("book"), col("chapter"),
        explode(col("best.Words")).as("w"))
      .select(col("book"), col("chapter"),
        col("w.Word").as("text"),
        (col("w.Offset") / 1e7).as("start"),
        ((col("w.Offset") + col("w.Duration")) / 1e7).as("end"),
        col("w.Confidence").as("confidence")))

  /** Normalize Azure batch REST payloads (nbest[0] per phrase). */
  def fromAzureBatch(df: DataFrame, payloadCol: String = "payload")
  : DataFrame = withSeq(
    df.select(col("book"), col("chapter"),
        explode(from_json(col(payloadCol), azureBatchSchema)
          ("recognizedPhrases")).as("phrase"))
      .select(col("book"), col("chapter"),
        element_at(col("phrase.nbest"), 1).as("best"))
      .select(col("book"), col("chapter"), col("best.confidence"),
        explode(col("best.words")).as("w"))
      .select(col("book"), col("chapter"),
        col("w.word").as("text"),
        (col("w.offsetInTicks") / 1e7).as("start"),
        ((col("w.offsetInTicks") + col("w.durationInTicks")) / 1e7)
          .as("end"),
        col("confidence")))

  def toDataset(spark: SparkSession, df: DataFrame)
  : Dataset[TranscribedWord] = {
    import spark.implicits._
    df.as[TranscribedWord]
  }
}
