package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The PDF→OCR→NLP grammar-book pipeline
  * (scripts/convert_hebrew_grammar_pdf.py) re-expressed Spark-first.
  *
  * Real pieces (no stubs): NFC normalization, undiacritized projection,
  * nikud/dagesh bitmaps (P4), unicode QA validation (P6), Hebrew token
  * filtering (P14), OCR line flattening (P16). Stubbed external models
  * (this container ships no OCR/NER runtimes): page rasterization (S12),
  * Document-Intelligence OCR (X10), DictaBERT NER/morphology (X11) — each
  * stub is deterministic and keeps the production schema and partition
  * shape.
  *
  * NOTE: the reference's nikud bitmap checks membership in the literal
  * 3-char string 'ְ-ׇ' (convert_hebrew_grammar_pdf.py:123) —
  * a bug; this engine implements the intended codepoint-range semantics.
  */
object GrammarPipeline {

  private val nfcUdf = udf { s: String =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  private val isNfcUdf = udf { s: String =>
    s != null &&
      java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)
  }

  /** P4: NFC normalize (ICU-equivalent via JDK Normalizer). */
  def nfcNormalize(c: Column): Column = nfcUdf(c)

  /** P4: diacritics stripped (U+05B0–U+05C7). */
  def undiacritized(c: Column): Column =
    regexp_replace(c, "[\\u05B0-\\u05C7]", "")

  /** P4: per-character 0/1 bitmap of diacritic positions over the
    * NFC-normalized text. Pure HOF — codegen'd, no UDF.
    */
  def nikudBitmap(c: Column): Column =
    transform(split(c, ""),
      ch => when(ch.rlike("[\\u05B0-\\u05C7]"), 1).otherwise(0)
        .cast("byte"))

  /** P4: dagesh (U+05BC) positions. */
  def dageshBitmap(c: Column): Column =
    transform(split(c, ""),
      ch => when(ch === "ּ", 1).otherwise(0).cast("byte"))

  /** P6: unicode QA checks (proper NFC, no replacement chars, Hebrew
    * present) as a struct column.
    */
  def validation(c: Column): Column = struct(
    isNfcUdf(c).as("proper_normalization"),
    !c.rlike("�").as("no_encoding_errors"),
    c.rlike("[\\u0590-\\u05FF]").as("hebrew_character_presence"))

  /** P14: keep only Hebrew tokens (the hebrew_tokenizer kind==HEBREW
    * filter) and rejoin (process_hebrew_text's clean_text).
    */
  def hebrewTokensOnly(c: Column): Column =
    array_join(filter(split(c, "\\s+"),
      t => t.rlike("^[\\u0590-\\u05FF]+$")), " ")

  /** P16: OCR line flatten — lines array → single text. */
  def flattenLines(lines: Column): Column = array_join(lines, " ")

  // ---- stubbed external-model operators (deterministic) ----

  /** S12 stub: split a PDF binary into per-page rows. Real layout: one
    * input row fans out to N page rows via posexplode (the flatMap
    * generator shape); the page "image" is a byte slice stand-in for the
    * 300-dpi raster.
    */
  def pageSplit(df: DataFrame, contentCol: String,
      pageBytes: Int = 1024): DataFrame = {
    val nPages = greatest(ceil(length(col(contentCol)) /
      lit(pageBytes.toDouble)).cast("int"), lit(1))
    df.withColumn("page_number",
        explode(sequence(lit(1), nPages)))
      .withColumn("page_image",
        substring(col(contentCol), (col("page_number") - 1) * pageBytes + 1,
          lit(pageBytes)))
  }

  /** P17 stub: image preprocess (grayscale→CLAHE→bilateral→Otsu in
    * production) — identity on the stub bytes, real column shape.
    */
  def preprocessImage(c: Column): Column = c

  /** X10 stub: OCR a page image to text — deterministic digest-derived
    * token stream with the production output column shape. The digest
    * runs over `upper(hex(bytes))` rather than the raw bytes: DuckDB's
    * md5 only accepts VARCHAR, and byte-aligned slices of hex(content)
    * are identical strings in both engines — which is what makes the
    * whole q72 pipeline oracle-checkable.
    */
  def ocrStub(pageImage: Column): Column =
    concat(lit("עמוד "), substring(md5(upper(hex(pageImage))), 1, 8))

  /** X11 stub: NER over Hebrew tokens — tags tokens by a deterministic
    * rule, production schema ARRAY<STRUCT<word, entity, score>>.
    */
  def nerStub(c: Column): Column =
    transform(filter(split(c, "\\s+"), t => t =!= ""),
      t => struct(t.as("word"),
        when(substring(t, 1, 1).isin("א", "ב", "ג"), "PER")
          .otherwise("O").as("entity"),
        round(length(t) / 10.0 + 0.5, 2).as("score")))

  /** X11 stub: morphology tags, same shape. */
  def morphStub(c: Column): Column =
    transform(filter(split(c, "\\s+"), t => t =!= ""),
      t => struct(t.as("word"),
        when(length(t) > 4, "VERB").otherwise("NOUN").as("tag"),
        round(length(t) / 12.0 + 0.4, 2).as("score")))

  /** The full pipeline over a binary "PDF" column: pages → preprocess →
    * OCR → NLP → structure (P4) → validation (P6).
    */
  def run(pdfs: DataFrame, contentCol: String = "content"): DataFrame = {
    val pages = pageSplit(pdfs, contentCol)
      .withColumn("page_image", preprocessImage(col("page_image")))
      .withColumn("raw_text", ocrStub(col("page_image")))
    val nfc = nfcNormalize(col("raw_text"))
    pages.select(col("*"),
      nfc.as("text"),
      undiacritized(nfc).as("undiacritized"),
      nikudBitmap(nfc).as("nikud"),
      dageshBitmap(nfc).as("dagesh"),
      nerStub(hebrewTokensOnly(nfc)).as("entities"),
      morphStub(hebrewTokensOnly(nfc)).as("morphology"),
      validation(nfc).as("validation"))
      .drop(contentCol, "page_image")
  }
}
