package graft

import org.apache.spark.sql.SparkSession

/** Times the REGISTERED documents-family flagships on an arbitrary
  * documents dir (a [[GrowDocs]] corpus) — the driver's gate runs them
  * at sf0.01 (500 docs) and the headline bench at sf0.1 (5k): this is
  * the 200–800× point, exercising the exact `SparkEntry.queries`
  * entries (not bench-only re-compositions) so the recorded walls are
  * the shipped plans':
  *
  *  - q119_curation_capstone — component dedup flags → token-budget
  *    mixture → chunked-prefix-sum packing → derived-then-pinned shard
  *    write, the engine's flagship chain;
  *  - q92_neardup_removal — exact-collapse → banded MinHash → verify →
  *    greedy removal;
  *  - q113_simhash64_neighbors — the banded 64-bit SimHash pair family;
  *  - q104_incremental_dedup — batch-vs-corpus flags, inline path.
  *
  * Protocol: SELF-ADJUDICATING like [[Bench]] (the r15 DOCS_4m
  * artifact carried a host-contaminated single sample that needed
  * prose forensics to re-adjudicate — this closes that): warm (one
  * discarded run) then THREE timed noop-materialized samples per
  * query, each with its /proc/loadavg reading, min/median/samples all
  * persisted, and a fixed-work calib sentinel per query group — a
  * loaded window is machine-detectable from the artifact alone.
  *
  * Usage: DocsBench <documentsDir> [outDir] [names...]
  */
object DocsBench {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.lift(0).getOrElse("/tmp/grown1m")
    val outDir = args.lift(1).getOrElse("/tmp/docs_bench")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("q113_simhash64_neighbors", "q92_neardup_removal",
        "q104_incremental_dedup", "q130_cross_dedup_shuffled",
        "q119_curation_capstone")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-docs-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = Tables.documents(spark, dir).count()
    // fail on a mistyped name BEFORE any minutes-long measurement runs,
    // not between them
    names.foreach(n => require(SparkEntry.queries.contains(n),
      s"unknown query '$n' — registered: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    // a per-query failure is a RECORDED boundary (e.g. q104's broadcast
    // contract ending where the batch outgrows the driver), not a
    // reason to lose the other measurements. The calib sentinel lives
    // INSIDE each query's own record (r17 ADVICE): the old global
    // calib array skipped warm-failed queries, silently shifting the
    // positional query↔calib attribution the artifact exists to make
    // machine-decidable.
    val timings: Seq[(String, Either[String,
        (Double, Seq[(Double, Double)])])] =
      names.map { name =>
        val q = SparkEntry.queries(name)
        try {
          q(spark, dir).write.format("noop").mode("overwrite").save() // warm
          val calib = BenchProto.calibSec()
          val samples = (1 to 3).map { _ =>
            val l = BenchProto.load1()
            val t0 = System.nanoTime()
            q(spark, dir).write.format("noop").mode("overwrite").save()
            ((System.nanoTime() - t0) / 1e9, l)
          }
          println(f"$name: ${samples.map(_._1).min}%.1f s (min of " +
            samples.map(s => f"${s._1}%.1f").mkString("[", ",", "]") + ")")
          name -> Right((calib, samples))
        } catch {
          case e: Exception =>
            // message may be null (bare NPE) or empty — never let the
            // recorder itself throw and lose the measured queries
            val msg = Option(e.getMessage).filter(_.nonEmpty)
              .flatMap(_.linesIterator.find(_.nonEmpty))
              .getOrElse(e.getClass.getName).take(160)
            println(s"$name FAILED: $msg")
            name -> Left(msg)
        }
      }
    def jsonStr(m: String): String = m.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => " " // control chars (Spark plans embed tabs)
      case c => c.toString
    }
    def seq(xs: Seq[Double]) =
      xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    val json = s"""{"metric":"docs_bench","docs":$nDocs,""" +
      s""""stat":"min_of_3","queries":{""" +
      timings.map {
        case (n, Right((calib, ss))) =>
          val ts = ss.map(_._1)
          f""""$n":{"sec":${ts.min}%.3f,""" +
            f""""median":${ts.sorted.apply(ts.size / 2)}%.3f,""" +
            f""""calib":$calib%.3f,""" +
            s""""samples":${seq(ts)},"load1":${seq(ss.map(_._2))}}"""
        case (n, Left(m)) => s""""$n":{"failed":"${jsonStr(m)}"}"""
      }.mkString(",") + "}}"
    println(json)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir)): Unit
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, s"docs_${nDocs}.json"),
      (json + "\n").getBytes("UTF-8")): Unit
    spark.stop()
  }
}
