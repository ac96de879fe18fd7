package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.Dedup

/** The chain-graph scale point for the two connected-components loops
  * — the adversary their scaladoc names but (pre-r15) never measured:
  * on template-family corpora (diameter ≤ ~3) both converge in a
  * handful of rounds and the plain loop's single shuffle per round
  * wins; on a LONG-DIAMETER graph the plain loop's O(diameter) rounds
  * are the cost and pointer-doubling's O(log diameter) is the escape.
  * This records rounds × per-round wall for BOTH loops over the SAME
  * banded pair graph of a `GrowDocs mode=chain` corpus, plus a
  * distributed label-parity check.
  *
  * Banding is r=1 (numHashes = bands = 16): chain edges sit at
  * J ≈ 0.326, where the default r=4 banding catches ~4% of edges
  * (the chain would fragment into short segments and the long
  * diameter under test would vanish); at r=1 an edge is missed with
  * P ≈ (1−.326)¹⁶ ≈ 2·10⁻³, so chains arrive near-intact. The exact
  * verify keeps the 0.3 cut: chain edges (0.3258) pass, everything
  * else is J=0 by construction.
  *
  * The pair graph materializes ONCE (localCheckpoint) before either
  * loop runs: the loops' own edge persist covers the within-loop
  * reuse, but re-deriving the banding pipeline per loop would put
  * ~2× the setup cost into whichever loop runs second.
  *
  * Usage: CcBench <documentsDir> [outDir] [maxPlain=200] [maxFast=40]
  */
object CcBench {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.lift(0).getOrElse("/tmp/grown1m_chain")
    val outDir = args.lift(1).getOrElse("/tmp/cc_bench")
    val maxPlain = args.lift(2).map(_.toInt).getOrElse(200)
    val maxFast = args.lift(3).map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cc-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val nDocs = docs.count()
    val tPairs0 = System.nanoTime()
    val pairs = Dedup.minhashBandPairsOver(docs,
      TextFunctions.wordShingles(col("text"), 3), "doc_id",
      numHashes = 16, bands = 16, minJaccard = 0.3)
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val pairsSec = (System.nanoTime() - tPairs0) / 1e9
    println(f"pairs: $nPairs rows in $pairsSec%.1f s")

    def timeLoop(tag: String, run: () => org.apache.spark.sql.DataFrame)
    : (org.apache.spark.sql.DataFrame, Int, Double) = {
      val t0 = System.nanoTime()
      val labels = run()
      val n = labels.count() // the loop materializes on return; count pins it
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = Dedup.lastCcRounds
      println(f"$tag: $n labels, $rounds rounds, $sec%.1f s " +
        f"(${sec / rounds}%.2f s/round)")
      (labels, rounds, sec)
    }
    // fast first: if the plain loop blows its round budget the fast
    // number is already on record
    val (fastL, fastRounds, fastSec) =
      timeLoop("fast", () => Dedup.connectedComponentsFast(pairs, maxFast))
    // the auto loop under its DEFAULT switchAfter — the number a caller
    // who doesn't know the graph shape gets on this adversary
    val (autoL, autoRounds, autoSec) =
      timeLoop("auto", () => Dedup.connectedComponentsAuto(pairs,
        maxIters = maxFast + 4))
    val (plainL, plainRounds, plainSec) =
      timeLoop("plain", () => Dedup.connectedComponents(pairs, maxPlain))

    val mismatches = plainL.as("p")
      .join(fastL.as("f"), Seq("id"), "full")
      .filter(col("p.rep").isNull || col("f.rep").isNull ||
        col("p.rep") =!= col("f.rep")).count()
    val autoMismatches = plainL.as("p")
      .join(autoL.as("a"), Seq("id"), "full")
      .filter(col("p.rep").isNull || col("a.rep").isNull ||
        col("p.rep") =!= col("a.rep")).count()
    val components = plainL.select("rep").distinct().count()

    val json =
      f"""{"metric":"cc_chain","docs":$nDocs,"pairs":$nPairs,""" +
        f""""pairs_sec":$pairsSec%.1f,"components":$components,""" +
        f""""plain":{"rounds":$plainRounds,"sec":$plainSec%.1f},""" +
        f""""fast":{"rounds":$fastRounds,"sec":$fastSec%.1f},""" +
        f""""auto":{"rounds":$autoRounds,"sec":$autoSec%.1f},""" +
        f""""label_mismatches":$mismatches,""" +
        f""""auto_label_mismatches":$autoMismatches}"""
    println(json)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir)): Unit
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, s"cc_${nDocs}.json"),
      (json + "\n").getBytes("UTF-8")): Unit
    spark.stop()
  }
}
