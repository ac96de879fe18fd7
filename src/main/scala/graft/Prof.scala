package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.functions.TextFunctions._

/** Scratch profiling main (not part of the library surface). */
object Prof {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    time("scan")(docs.count())
    time("shingle explode")(
      docs.select(col("doc_id"), explode(wordShingles(col("text"), 3)).as("tok"))
        .count())
    time("shingle + md5 agg")(
      docs.select(col("doc_id"), explode(wordShingles(col("text"), 3)).as("tok"))
        .withColumn("h", md5(col("tok")))
        .groupBy("doc_id").agg(count(lit(1)).as("n")).count())
    time("simhashOver full")(
      Dedup.simhashOver(docs, wordShingles(col("text"), 3), "doc_id").count())

    // inside simhashNeighbors
    val keepers = {
      val key = fingerprint(col("text"))
      docs.withColumn("_ck", key)
        .withColumn("_keep", col("doc_id") ===
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("_ck"))))
        .filter(col("_keep")).drop("_ck", "_keep")
    }
    time("keepers")(keepers.count())
    val codes = Dedup.simhashOver(keepers, wordShingles(col("text"), 3),
      "doc_id").select(col("doc_id").as("id"), col("simhash"))
    time("codes (collapse+simhash)")(codes.count())
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band"), substring(col("simhash"), b * 8 + 1, 8).as("bits")))
    val bandRows = codes.select(col("id"), col("simhash"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    val buckets = bandRows.groupBy(col("band"), col("bits"))
      .agg(collect_list(struct(col("id"), col("simhash"))).as("ms"))
      .filter(size(col("ms")) > 1)
    time("buckets")(buckets.count())
    val stats = buckets.agg(sum(size(col("ms")) * (size(col("ms")) - 1) / 2)
      .as("pairs"), max(size(col("ms"))).as("maxg")).collect()(0)
    println(s"PROF bucket pair budget: ${stats.get(0)}, max bucket: ${stats.get(1)}")
    time("q94 full")(
      Dedup.simhashNeighbors(docs, "text", "doc_id").count())
    spark.stop()
  }
}
