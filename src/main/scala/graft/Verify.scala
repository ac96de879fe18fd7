package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Usage: Verify <sfDir> <outDir> [substring] — the optional third arg
  * restricts the dump to query names containing it (builder tooling for
  * re-dumping one query after a rewrite; the driver passes two args and
  * gets the full sweep).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val nameFilter = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(name.contains) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A query that throws must leave a red trace in the gate, not a
        // silent absence: write a sentinel the checker turns into a
        // failing row (r8 lost 26 queries to an analysis error with the
        // artifact still reading "0 fails").
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = Paths.get(s"$outDir/$name")
        Files.createDirectories(dir)
        val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}"
          .take(2000)
        Files.writeString(dir.resolve("_ERROR.json"),
          s"""{"query":${OracleJson.quote(name)},"err":${OracleJson.quote(msg)}}""")
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      OracleJson.render)
    if (failed > 0)
      System.err.println(s"[verify] $failed quer${if (failed == 1) "y" else "ies"} FAILED — sentinels written")
    spark.stop()
  }
}
