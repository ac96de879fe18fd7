package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S14: audio file catalog over Spark's `binaryFile` source. Columns:
  * path, modificationTime, length, content (BINARY). Filename parsing is
  * a regexp projection (P10); validity is a plain filter (P11) —
  * both pushed into the scan by Catalyst where possible.
  *
  * The reference's layout: `{NN_BookName}/{NN-Abbr_CC}.mp3`
  * (hebrew_alignment_tool.py:152-160).
  */
object AudioCatalog {

  /** Scan a directory tree of audio files (glob-filtered, S14). */
  def scan(spark: SparkSession, dir: String,
      glob: String = "*.{mp3,wav,m4a}"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** P10: parse (folderNum, bookAbbr, chapter) from the reference layout. */
  def parsePath(df: DataFrame): DataFrame =
    df.withColumn("folder",
        regexp_extract(col("path"), "([^/]+)/[^/]+$", 1))
      .withColumn("book_num",
        regexp_extract(col("path"), "/(\\d+)-[^/]+$", 1))
      .withColumn("abbr",
        regexp_extract(col("path"), "/\\d+-([A-Za-z0-9]+)_\\d+\\.[a-z0-9]+$", 1))
      .withColumn("chapter",
        regexp_extract(col("path"), "_(\\d+)\\.[a-z0-9]+$", 1).cast("int"))

  /** P11: audio validity filter (exists ∧ >1 KB ∧ known extension;
    * fixed_hebrew_aligner.py:235-250). Duration>0 is checked post-decode.
    */
  def valid(df: DataFrame): DataFrame =
    df.filter(col("length") > 1024 &&
      lower(regexp_extract(col("path"), "\\.([a-z0-9]+)$", 1))
        .isin("mp3", "wav", "m4a"))

  /** S3: local-preferred content resolution — a left join of the expected
    * catalog against an alternate store, `coalesce` picking the first
    * available content (the blob-fallback pattern,
    * hebrew_alignment_tool.py:162-175).
    */
  def withFallback(local: DataFrame, remote: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val l = local.select(keyCols.map(col) :+
      col("content").as("local_content"): _*)
    val r = remote.select(keyCols.map(col) :+
      col("content").as("remote_content"): _*)
    l.join(r, keyCols, "full_outer")
      .withColumn("content",
        coalesce(col("local_content"), col("remote_content")))
      .drop("local_content", "remote_content")
  }

  /** S4 decode stub: the container has no audio codecs, so "decode"
    * derives deterministic PCM-like floats from the bytes. The decode is
    * a black-box per-row kernel exactly like a real codec call, so a
    * Scala UDF is the honest shape here (the real decoder would also be
    * opaque to Catalyst); the surrounding plumbing — binary column in,
    * ARRAY<FLOAT> + duration out — is the production layout. S5's
    * fallback chain (kaiser_fast → kaiser_best → soundfile) lives inside
    * this kernel in production.
    */
  private val decodeBytes = udf { bytes: Array[Byte] =>
    if (bytes == null) Array.empty[Float]
    else bytes.map(b => b.toInt / 128.0f)
  }

  def decodeStub(df: DataFrame, sampleRate: Int = 16000): DataFrame =
    df.withColumn("sample_rate", lit(sampleRate))
      .withColumn("samples", decodeBytes(col("content")))
      .withColumn("duration",
        size(col("samples")) / col("sample_rate").cast("double"))

  /** S5: decode fallback chain (kaiser_fast → kaiser_best → soundfile,
    * scripts/hebrew_alignment_tool_optimized.py:281-303): codecs try in
    * order inside the task; the first success wins, total failure yields
    * an empty sample array plus the failing codec count — the caller's
    * P11 duration>0 filter then drops the row with provenance intact.
    */
  def decodeWithFallback(df: DataFrame,
      codecs: Seq[Array[Byte] => Option[Array[Float]]]): DataFrame = {
    val chain = udf { bytes: Array[Byte] =>
      var i = 0
      var out: Option[Array[Float]] = None
      while (out.isEmpty && i < codecs.size) {
        out = try codecs(i)(bytes) catch { case _: Exception => None }
        i += 1
      }
      (out.getOrElse(Array.empty[Float]), i)
    }
    df.withColumn("_dec", chain(col("content")))
      .withColumn("samples", col("_dec._1"))
      .withColumn("codec_attempts", col("_dec._2"))
      .drop("_dec")
  }
}
