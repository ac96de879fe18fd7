package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{GrammarPipeline, Multimodal, Similarity}
import graft.ops.Multimodal.MediaRow

/** Multimodal + grammar-pipeline surface over synthesized binary columns
  * (documents text → utf-8 bytes stand in for media payloads). Rows-only
  * driver checks — the decode kernels are stubs; schemas, partition
  * shapes, and the downstream ANN join are production-real.
  */
object MultimodalQueries {

  private def media(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "utf-8").as("content"))
      .as[MediaRow]
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Decode + resize + frame-sample over binary media columns.
    "q70_media_pipeline" -> ((s, d) => {
      val decoded = Multimodal.decode(media(s, d)).toDF()
      val resized = Multimodal.resizeMeta(decoded, maxSide = 256)
      Multimodal.sampleFrames(resized, everyNth = 30)
        .unionByName(resized.filter(col("n_frames") === 0)
          .withColumn("frame_idx", lit(-1)))
        .orderBy("media_id", "frame_idx")
    }),

    // Binary → embedding → ANN: multimodal content joins the similarity
    // path (top-5 cosine neighbors of media 0 among same-kind items).
    "q71_media_embed_ann" -> ((s, d) => {
      val emb = Multimodal.embed(media(s, d))
      Similarity.knnCosine(emb.filter(col("kind") === "image"),
        "media_id", "embedding", queryId = 0L, k = 5)
    }),

    // PDF→OCR→NLP pipeline: page fan-out, NFC/bitmaps/NER/validation.
    "q72_grammar_pipeline" -> ((s, d) => {
      val pdfs = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id").as("book"),
          encode(col("text"), "utf-8").as("content"))
      GrammarPipeline.run(pdfs)
        .select(col("book"), col("page_number"), col("text"),
          col("undiacritized"), size(col("nikud")).as("nikud_len"),
          size(col("entities")).as("n_entities"),
          col("validation.proper_normalization"),
          col("validation.hebrew_character_presence"))
        .orderBy("book", "page_number")
    })
  )

  def oracle: Map[String, String] = Map.empty
}
