package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{GrammarPipeline, Multimodal, Similarity}
import graft.ops.Multimodal.MediaRow

/** Multimodal + grammar-pipeline surface over synthesized binary columns
  * (documents text → utf-8 bytes stand in for media payloads). The
  * decode/embed/OCR kernels are deterministic md5-arithmetic stubs,
  * which makes all three queries exactly oracle-checkable in DuckDB:
  * q70 (decode → resize → frame-sample), q71 (embed → ANN), and q72
  * (page fan-out → OCR → NFC/bitmaps/NER). Schemas, partition shapes,
  * and the downstream ANN join are production-real.
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
    // Exactly oracled: the OCR stub digests upper(hex(page bytes)) —
    // byte-aligned hex slices match across engines — and every
    // downstream kernel (NFC, diacritic strip, bitmaps, Hebrew-token
    // NER) is pure string arithmetic on the digest text.
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

  def oracle: Map[String, String] = Map(

    // Mirrors Multimodal.decode/resizeMeta/sampleFrames exactly: the
    // stub hash is the engine-standard first-60-bits-of-md5, the resize
    // scale is IEEE double arithmetic in both engines, and range(0, n,
    // 30) matches sequence(0, n-1, 30).
    "q70_media_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
        |      AS kind,
        |    CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h,
        |    CAST(strlen(text) AS INTEGER) AS byte_len
        |  FROM documents),
        |dec AS (
        |  SELECT media_id, kind,
        |    CAST(CASE kind WHEN 'image' THEN 64 + h % 512
        |      WHEN 'audio' THEN 0 ELSE 320 END AS INTEGER) AS width,
        |    CAST(CASE kind WHEN 'image' THEN 64 + (h // 512) % 512
        |      WHEN 'audio' THEN 0 ELSE 240 END AS INTEGER) AS height,
        |    CAST(CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN 0
        |      ELSE 1 + h % 300 END AS INTEGER) AS n_frames,
        |    CAST(CASE WHEN kind = 'audio' THEN
        |        CASE WHEN h % 2 = 0 THEN 16000 ELSE 22050 END
        |      ELSE 0 END AS INTEGER) AS sample_rate,
        |    byte_len
        |  FROM m),
        |rz AS (
        |  SELECT *,
        |    CAST(CEIL(width * scale) AS INTEGER) AS out_width,
        |    CAST(CEIL(height * scale) AS INTEGER) AS out_height
        |  FROM (SELECT *, LEAST(1.0, 256 / GREATEST(width, height, 1))
        |    AS scale FROM dec))
        |SELECT media_id, kind, width, height, n_frames, sample_rate,
        |  byte_len, out_width, out_height, CAST(f AS INTEGER) AS frame_idx
        |FROM (
        |  SELECT rz.* EXCLUDE (scale), unnest(range(0, n_frames, 30)) AS f
        |  FROM rz WHERE n_frames > 0
        |  UNION ALL
        |  SELECT rz.* EXCLUDE (scale), -1 AS f FROM rz WHERE n_frames = 0)
        |ORDER BY media_id, frame_idx""".stripMargin,

    // Mirrors Multimodal.embed + Similarity.knnCosine: vec[i] =
    // ((signed_byte(md5[i]) + 7i) % 128) / 128 is exact in float32 and
    // double alike (power-of-two denominator), so only the dot-product
    // summation order differs — absorbed by ROUND(..., 5) like q56.
    "q71_media_embed_ann" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, md5(text) AS hx
        |  FROM documents WHERE doc_id % 3 = 0),
        |vx AS (
        |  SELECT media_id, i,
        |    (((CASE WHEN u >= 128 THEN u - 256 ELSE u END) + 7 * i) % 128)
        |      / 128.0 AS x
        |  FROM (
        |    SELECT media_id, gs.i AS i,
        |      CAST('0x' || substring(hx, 2 * gs.i + 1, 2) AS INTEGER) AS u
        |    FROM img, (SELECT unnest(range(0, 16)) AS i) gs)),
        |qx AS (SELECT i, x FROM vx WHERE media_id = 0),
        |nq AS (SELECT sqrt(sum(x * x)) AS n FROM qx),
        |dots AS (
        |  SELECT v.media_id, sum(v.x * q.x) AS dot,
        |    sqrt(sum(v.x * v.x)) AS na
        |  FROM vx v JOIN qx q USING (i) WHERE v.media_id <> 0
        |  GROUP BY v.media_id)
        |SELECT media_id, ROUND(dot / (na * nq.n), 5) AS cos_sim
        |FROM dots, nq ORDER BY cos_sim DESC, media_id LIMIT 5""".stripMargin,

    // Mirrors GrammarPipeline.run's q72 projection: 1024-byte pages =
    // 2048 hex chars; the OCR text is 'עמוד ' + first 8 of
    // md5(upper(hex(page))), which is NFC-stable, diacritic-free, and
    // yields exactly one Hebrew token (so one NER entity) per page.
    "q72_grammar_pipeline" ->
      """WITH src AS (
        |  SELECT doc_id AS book, upper(hex(encode(text))) AS hx
        |  FROM documents WHERE doc_id < 100),
        |pg AS (
        |  SELECT book, hx,
        |    unnest(range(1, GREATEST(CAST(CEIL(length(hx) / 2048.0)
        |      AS INTEGER), 1) + 1)) AS page_number
        |  FROM src),
        |ocr AS (
        |  SELECT book, CAST(page_number AS INTEGER) AS page_number,
        |    'עמוד ' || substring(
        |      md5(substring(hx, (page_number - 1) * 2048 + 1, 2048)),
        |      1, 8) AS text
        |  FROM pg)
        |SELECT book, page_number, text,
        |  regexp_replace(text, '[\x{05B0}-\x{05C7}]', '', 'g')
        |    AS undiacritized,
        |  CAST(length(text) AS INTEGER) AS nikud_len,
        |  1 AS n_entities,
        |  TRUE AS proper_normalization,
        |  TRUE AS hebrew_character_presence
        |FROM ocr ORDER BY book, page_number""".stripMargin
  )
}
