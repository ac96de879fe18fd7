package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Verse

/** S1: bible JSON scan. The source shape is a single nested map
  * `{book: [chapter: [verse: [word]]]}` (hebrew_alignment_tool.py:137-150);
  * the `Aramaic` key is dropped on load (line 141).
  *
  * Spark-first: read with an explicit MapType schema (fail-fast on drift,
  * SURVEY.md §1.7) and flatten with a triple `posexplode` — all built-in
  * generators, fully codegen'd, no UDFs. Indices are 1-based like the
  * reference's enumerate(..., 1).
  */
object BibleReader {

  val bibleSchema: MapType = MapType(StringType,
    ArrayType(ArrayType(ArrayType(StringType))))

  /** Read the raw nested JSON into one row per (book, chapters). */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val text = spark.read.option("wholetext", true).text(path)
    text.select(from_json(col("value"), bibleSchema).as("bible"))
      .select(explode(col("bible")).as(Seq("book", "chapters")))
      .filter(col("book") =!= "Aramaic")
  }

  /** Flatten to the verses Dataset (SURVEY.md §1.1). */
  def readVerses(spark: SparkSession, path: String): Dataset[Verse] = {
    import spark.implicits._
    readRaw(spark, path)
      .select(col("book"),
        posexplode(col("chapters")).as(Seq("chapter0", "verses")))
      .select(col("book"), (col("chapter0") + 1).as("chapter"),
        posexplode(col("verses")).as(Seq("verse0", "words")))
      .select(col("book"), col("chapter").cast("int"),
        (col("verse0") + 1).cast("int").as("verseNum"), col("words"),
        concat_ws(" ", col("words")).as("text"),
        size(col("words")).as("wordCount"))
      .as[Verse]
  }
}
