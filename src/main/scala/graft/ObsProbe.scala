package graft
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("probe")
    val df = spark.range(100).toDF("id")
      .withColumn("rep", col("id") % 7)
      .observe(obs, count(when(col("rep") < 3, 1)).as("changed"))
      .localCheckpoint(true)
    println("checkpointed rows=" + df.count())
    println("observed changed=" + obs.get("changed"))
    // empty-frame edge
    val obs2 = Observation("probe2")
    val e = spark.range(0).toDF("id")
      .observe(obs2, count(when(col("id") > 0, 1)).as("c"))
      .localCheckpoint(true)
    println("empty rows=" + e.count() + " observed=" + obs2.get("c"))
    spark.stop()
  }
}
