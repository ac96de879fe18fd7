package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J1: book-code resolution. The reference resolves codes in three stages
  * (exact → alias map → case-insensitive scan,
  * scripts/hebrew_alignment_tool_gpu.py:269-296). Spark-first: precompute
  * every alias (including lowercase forms) into the dimension so ONE
  * broadcast equi-join on `lower(code)` covers all three stages — no
  * fallback chain at runtime, no repeated scans.
  *
  * The dimension is ≤ a few hundred rows ⇒ always a broadcast-hash join;
  * at 100 TB the fact side streams through map-side without a shuffle.
  */
object BookResolve {

  /** The canonical 39-book mapping (hebrew_alignment_tool.py:46-86) with
    * common aliases (fixed_hebrew_aligner.py:36-94).
    */
  val canonical: Seq[(String, String, String)] = Seq(
    ("Gen", "01_Genesis", "Gen"), ("Exo", "02_Exodus", "Exo"),
    ("Lev", "03_Leviticus", "Lev"), ("Num", "04_Numbers", "Num"),
    ("Deu", "05_Deuteronomy", "Deu"), ("Jos", "06_Joshua", "Jos"),
    ("Jdg", "07_Judges", "Jdg"), ("Rut", "30_Ruth", "Rut"),
    ("1Sa", "08_1Samuel", "1Sa"), ("2Sa", "09_2Samuel", "2Sa"),
    ("1Ki", "10_1Kings", "1Ki"), ("2Ki", "11_2Kings", "2Ki"),
    ("1Ch", "38_1Chronicles", "1Ch"), ("2Ch", "39_2Chronicles", "2Ch"),
    ("Ezr", "36_Ezra", "Ezr"), ("Neh", "37_Nehemiah", "Neh"),
    ("Est", "34_Esther", "Est"), ("Job", "29_Job", "Job"),
    ("Psa", "27_Psalms", "Psa"), ("Pro", "28_Proverbs", "Pro"),
    ("Ecc", "33_Ecclesiastes", "Ecc"), ("Sol", "31_SongofSongs", "Sol"),
    ("Isa", "12_Isaiah", "Isa"), ("Jer", "13_Jeremiah", "Jer"),
    ("Lam", "32_Lamentations", "Lam"), ("Eze", "14_Ezekiel", "Eze"),
    ("Dan", "35_Daniel", "Dan"), ("Hos", "15_Hosea", "Hos"),
    ("Joe", "16_Joel", "Joe"), ("Amo", "17_Amos", "Amo"),
    ("Oba", "18_Obadiah", "Oba"), ("Jon", "19_Jonah", "Jon"),
    ("Mic", "20_Micah", "Mic"), ("Nah", "21_Nahum", "Nah"),
    ("Hab", "22_Habakkuk", "Hab"), ("Zep", "23_Zephaniah", "Zep"),
    ("Hag", "24_Haggai", "Hag"), ("Zec", "25_Zechariah", "Zec"),
    ("Mal", "26_Malachi", "Mal"))

  val aliases: Seq[(String, String)] = Seq(
    "Genesis" -> "Gen", "Exod" -> "Exo", "Exodus" -> "Exo",
    "Leviticus" -> "Lev", "Numbers" -> "Num", "Deut" -> "Deu",
    "Deuteronomy" -> "Deu", "Joshua" -> "Jos", "Judges" -> "Jdg",
    "Ruth" -> "Rut", "1Sam" -> "1Sa", "2Sam" -> "2Sa",
    "1Kgs" -> "1Ki", "2Kgs" -> "2Ki", "1Chr" -> "1Ch", "2Chr" -> "2Ch",
    "Ezra" -> "Ezr", "Nehemiah" -> "Neh", "Esther" -> "Est",
    "Ps" -> "Psa", "Psalms" -> "Psa", "Prov" -> "Pro",
    "Proverbs" -> "Pro", "Eccl" -> "Ecc", "Song" -> "Sol",
    "Isaiah" -> "Isa", "Jeremiah" -> "Jer", "Ezek" -> "Eze",
    "Daniel" -> "Dan", "Hosea" -> "Hos", "Joel" -> "Joe",
    "Amos" -> "Amo", "Obad" -> "Oba", "Jonah" -> "Jon",
    "Micah" -> "Mic", "Nahum" -> "Nah", "Hab" -> "Hab",
    "Zeph" -> "Zep", "Haggai" -> "Hag", "Zech" -> "Zec", "Mal" -> "Mal")

  /** Build the alias-extended dimension: one row per (lower(alias)) →
    * canonical code + folder + abbr.
    */
  def dimension(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val canon = canonical.toDF("canonical", "folder", "abbr")
    val selfAliases = canonical.map { case (c, _, _) => (c, c) }
    val allAliases = (selfAliases ++ aliases).toDF("alias", "canonical")
    allAliases.join(canon, "canonical")
      .select(lower(col("alias")).as("alias_key"), col("canonical"),
        col("folder"), col("abbr"))
      .dropDuplicates("alias_key")
  }

  /** Resolve a code column against the dimension: one broadcast join.
    * Unresolvable codes keep null canonical (caller decides J5
    * diagnostics via anti-join).
    */
  def resolve(df: DataFrame, codeCol: String, spark: SparkSession)
  : DataFrame =
    df.join(broadcast(dimension(spark)),
      lower(col(codeCol)) === col("alias_key"), "left")
      .drop("alias_key")

  /** J5 diagnostics: codes present in the data but not the mapping, and
    * mapping entries with no data (debug_book_codes.py:45-65).
    */
  def diagnostics(df: DataFrame, codeCol: String, spark: SparkSession)
  : (DataFrame, DataFrame) = {
    val dim = dimension(spark)
    val missing = df.select(lower(col(codeCol)).as("alias_key")).distinct()
      .join(broadcast(dim), Seq("alias_key"), "left_anti")
    val unused = dim.join(
      df.select(lower(col(codeCol)).as("alias_key")).distinct(),
      Seq("alias_key"), "left_anti")
    (missing, unused)
  }
}
