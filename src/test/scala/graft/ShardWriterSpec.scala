package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.ShardWriter

class ShardWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("writeShards: exact shard count, sorted within shards, " +
    "disjoint key ranges, near-balance") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (1 to 10000).map(_ => rnd.nextInt(1000000))
      .zipWithIndex.map { case (k, i) => (k.toLong * 7 + i % 3, s"doc$i") }
      .toDF("doc_id", "text")
    val out = TestDirs.tmp("shards").toString

    ShardWriter.writeShards(df, out, numShards = 8, keyCol = "doc_id")
    val manifest = ShardWriter.shardManifest(spark, out, "doc_id").collect()
    assert(manifest.length == 8, s"expected 8 shards, got ${manifest.length}")
    // ranges disjoint and ordered: each shard's max < next shard's min
    manifest.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"overlapping shard ranges: ${a.getLong(3)} vs ${b.getLong(2)}")
    case _ => ()
    }
    // near-balanced: range partitioning keeps shards within ~3x
    val rows = manifest.map(_.getLong(1))
    assert(rows.max < rows.min * 3,
      s"unbalanced shards: ${rows.mkString(",")}")
    // sorted within each shard file
    val perFile = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("doc_id"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    perFile.values.foreach(ks => assert(ks == ks.sorted, "shard not sorted"))

    // global key order across shards: shard N's max < shard N+1's min
    // is the sliding check above; re-runs keep count/sort/balance (the
    // sampled boundaries themselves may wiggle — that's what the pinned
    // variant below is for)
    val out2 = TestDirs.tmp("shards2").toString
    ShardWriter.writeShards(df, out2, 8, "doc_id")
    assert(ShardWriter.shardManifest(spark, out2, "doc_id").count() == 8)
    assert(spark.read.parquet(out2).count() == 10000)
  }

  test("writeShardsPinned: shard membership is a pure function of the " +
    "key — byte-stable across re-runs and upstream layouts") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val df = (1 to 5000).map(i => (rnd.nextInt(100000).toLong, s"d$i"))
      .toDF("doc_id", "text")
    val bounds = Seq(25000L, 50000L, 75000L)
    def run(input: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] = {
      val out = TestDirs.tmp("pinned").toString
      ShardWriter.writeShardsPinned(input, out, "doc_id", bounds)
      spark.read.parquet(out)
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    }
    val a = run(df)
    val b = run(df.repartition(17)) // different upstream layout
    assert(a == b, s"pinned layout drifted: $a vs $b")
    assert(a.keySet == Set(0L, 1L, 2L, 3L))
    // membership follows the boundaries exactly
    assert(a(0L)._3 <= 25000L && a(1L)._2 > 25000L && a(3L)._2 > 75000L)
    // one file per shard directory
    val outDir = TestDirs.tmp("pinned_files").toString
    ShardWriter.writeShardsPinned(df, outDir, "doc_id", bounds)
    new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("shard=")).foreach { d =>
        assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
          s"${d.getName} has more than one file")
      }
  }

  test("writeShardsPinned: the HOF path (>64 boundaries) assigns the " +
    "same shards as the when-chain rule") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val bounds = (1 to 100).map(_ * 19L) // 100 boundaries → HOF path
    val out = TestDirs.tmp("pinned_hof").toString
    ShardWriter.writeShardsPinned(df, out, "doc_id", bounds)
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("int").as("shard"))
      .as[(Long, Int)].collect()
    got.foreach { case (id, shard) =>
      assert(shard === bounds.count(id > _), s"doc $id in shard $shard")
    }
  }

  test("maxRecordsPerFile splits an overflowing shard") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("doc_id")
    val out = TestDirs.tmp("shards_split").toString
    ShardWriter.writeShards(df, out, numShards = 2, keyCol = "doc_id",
      maxRecordsPerFile = 200L)
    val files = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files >= 5, s"expected >=5 files from 1000 rows / 200-cap, got $files")
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("boundariesFromQuantiles: deterministic across repartitions, and " +
    "the derived pinned layout stays balanced where fixed boundaries " +
    "collapse at a grown key range") {
    import spark.implicits._
    // a key range far beyond the q95/q119 demo boundaries (40/80/160):
    // skewed density so equal-width cuts would also mis-balance
    val rnd = new scala.util.Random(5)
    val keys = (0 until 4000).map(_ =>
      math.abs(rnd.nextGaussian() * 2000).toLong + 1)
    val df = keys.zipWithIndex.map { case (k, i) => (k * 7 + i % 7, s"d$i") }
      .toDF("doc_id", "payload")
    val b1 = ShardWriter.boundariesFromQuantiles(df, "doc_id", 4)
    val b2 = ShardWriter.boundariesFromQuantiles(
      df.repartition(13, col("payload")), "doc_id", 4)
    assert(b1 == b2, "boundaries depend on partitioning")
    assert(b1.size == 3 && b1 == b1.sorted)

    def shardCounts(bounds: Seq[Long]): Seq[Long] = {
      val out = TestDirs.tmp("quantile_shards").toFile.getAbsolutePath
      ShardWriter.writeShardsPinned(df, out, "doc_id", bounds)
      spark.read.parquet(out).groupBy("shard").count()
        .collect().map(_.getLong(1)).toSeq
    }
    val derived = shardCounts(b1)
    assert(derived.size == 4)
    // rank error ≤ n/10000 ⇒ near-perfect balance at n=4000
    assert(derived.max <= derived.min + derived.sum / 10,
      s"derived boundaries unbalanced: $derived")
    val fixed = shardCounts(Seq(40L, 80L, 160L))
    // the demo boundaries on this range: the last shard swallows ~all
    assert(fixed.max > fixed.sum * 8 / 10,
      s"expected the fixed-boundary collapse, got $fixed")
  }

  test("boundariesFromRanks + writeShardsDerived: exact rank cuts are " +
    "a pure function of the key multiset, the layout balances at the " +
    "collapse test's grown key range, and the sidecar pins re-writes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // same grown/skewed range as the collapse test above
    val keys = (0 until 4001).map(i =>
      math.abs(rnd.nextGaussian() * 2000).toLong * 7 + i % 5)
    val df = keys.zipWithIndex.map { case (k, i) => (k, s"d$i") }
      .toDF("doc_id", "payload")
    val b1 = ShardWriter.boundariesFromRanks(df, "doc_id", 4)
    val b2 = ShardWriter.boundariesFromRanks(
      df.repartition(13, col("payload")), "doc_id", 4)
    assert(b1 == b2, "rank boundaries depend on partitioning")
    // the oracle formula, recomputed driver-side: key at 1-indexed
    // rank i*n/4 of the sorted multiset
    val sorted = keys.sorted
    val n = sorted.length.toLong
    val want = (1 until 4).map(i => sorted((i * n / 4).toInt - 1))
      .distinct.sorted
    assert(b1 == want, s"rank cuts diverge: $b1 vs $want")

    val out = TestDirs.tmp("derived_shards").toFile.getAbsolutePath
    val bW = ShardWriter.writeShardsDerived(df, out, "doc_id", 4)
    assert(bW == b1)
    assert(ShardWriter.readBoundsSidecar(spark, out).contains(b1),
      "sidecar not persisted beside the layout")
    val counts = spark.read.parquet(out).groupBy("shard").count()
      .collect().map(_.getLong(1)).toSeq
    assert(counts.size == 4)
    // exact cuts: balanced up to the key's duplicate structure — far
    // from the fixed-boundary collapse the sibling test reproduces
    assert(counts.max <= counts.sum / 4 + counts.sum / 10,
      s"derived boundaries unbalanced: $counts")

    // the PIN: a later write against a grown snapshot reuses the
    // persisted boundaries — membership stays byte-stable until the
    // sidecar is deliberately dropped for a new snapshot derivation
    val grown = df.union(Seq((keys.max * 2, "dx"), (keys.max * 3, "dy"))
      .toDF("doc_id", "payload"))
    val bW2 = ShardWriter.writeShardsDerived(grown, out, "doc_id", 4)
    assert(bW2 == b1, "sidecar boundaries were not reused on re-write")
  }

  test("writeShardsDerived evaluates the upstream chain ONCE on the " +
    "derive path: the snapshot feeds both the rank sort and the " +
    "pinned write (the q119 derive-cost contract)") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("upstream_evals")
    val counted = (1L to 1000L).map(i => (i, s"d$i"))
      .toDF("doc_id", "payload")
      .as[(Long, String)]
      .map { r => acc.add(1); r }
      .toDF("doc_id", "payload")
    val out = TestDirs.tmp("derive_once").toFile.getAbsolutePath
    val bounds = ShardWriter.writeShardsDerived(counted, out, "doc_id", 4)
    assert(bounds.size == 3)
    assert(spark.read.parquet(out).count() == 1000)
    assert(acc.value == 1000,
      s"upstream chain evaluated ${acc.value / 1000.0}× on the derive " +
        "path — the snapshot is not feeding both consumers")
  }

  test("readKeyRange prunes to exactly the covering shard directories " +
    "(numFiles-gated), returns exactly the range's rows, and refuses " +
    "an unpinned layout") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val out = TestDirs.tmp("range_read").toFile.getAbsolutePath
    val bounds = ShardWriter.writeShardsDerived(df, out, "doc_id", 8)
    assert(bounds.size == 7)
    // a range inside shards 2..3 (bounds are exact rank cuts of 1..1000,
    // so shardOf(300)=2, shardOf(480)=3 for 8 equal shards of 125)
    val got = ShardWriter.readKeyRange(spark, out, "doc_id", 300L, 480L)
    val expect = (300L to 480L).toSet
    assert(got.select("doc_id").as[Long].collect().toSet === expect,
      "range read lost or invented rows")
    // the scan lists/reads ONLY the covering shards' files (one file per
    // shard dir by construction): a plan property, not luck
    val coveringShards = Set(bounds.count(_ < 300L), bounds.count(_ < 480L))
    val coveringFiles = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory &&
        coveringShards.map(s => s"shard=$s").contains(f.getName))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    got.collect() // materialize so scan metrics populate
    val scan = got.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    assert(scan.metrics("numFiles").value == coveringFiles,
      s"scan read ${scan.metrics("numFiles").value} files; the covering " +
        s"shards $coveringShards hold $coveringFiles — pruning failed")
    // a layout without a boundary pin is refused, not silently full-scanned
    val outRaw = TestDirs.tmp("range_read_unpinned").toFile.getAbsolutePath
    ShardWriter.writeShards(df, outRaw, 4, "doc_id")
    val ex = intercept[IllegalStateException] {
      ShardWriter.readKeyRange(spark, outRaw, "doc_id", 1L, 10L)
    }
    assert(ex.getMessage.contains("no boundary pin"))
  }

  test("sidecar is crash-safe: it lives OUTSIDE the overwritten layout " +
    "directory (survives a re-write that dies before re-pinning), a " +
    "degenerate zero-boundary pin round-trips, and the legacy in-dir " +
    "location is still read") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val out = TestDirs.tmp("sidecar_safe").toFile.getAbsolutePath
    val bounds = ShardWriter.writeShardsDerived(df, out, "doc_id", 4)
    // simulate the crash window: a later re-write commits its data
    // overwrite and dies before touching the sidecar — the pin must
    // already have survived the overwrite (sibling path, never cleared)
    ShardWriter.writeShardsPinned(df, out, "doc_id", bounds)
    assert(ShardWriter.readBoundsSidecar(spark, out).contains(bounds),
      "the data overwrite destroyed the boundary pin")

    // degenerate corpus: one distinct key ⇒ zero boundaries; the blank
    // sidecar payload must round-trip to Seq.empty, not a parse error
    val one = Seq((7L, "only")).toDF("doc_id", "payload")
    val outOne = TestDirs.tmp("sidecar_empty").toFile.getAbsolutePath
    assert(ShardWriter.writeShardsDerived(one, outOne, "doc_id", 4).isEmpty)
    assert(ShardWriter.readBoundsSidecar(spark, outOne)
      .contains(Seq.empty[Long]), "blank pin did not round-trip")
    // and the re-write consumes the empty pin without crashing
    assert(ShardWriter.writeShardsDerived(one, outOne, "doc_id", 4).isEmpty)
    // an empty pin must NOT outlive its degeneracy: once the frame has
    // ≥ 2 distinct keys (e.g. a sampling stage that transiently
    // selected nothing now selects normally), reusing Seq.empty would
    // put every row in shard 0 forever — the write re-derives instead
    val recovered = ShardWriter.writeShardsDerived(
      (1L to 100L).map(i => (i, s"r$i")).toDF("doc_id", "payload"),
      outOne, "doc_id", 4)
    assert(recovered === Seq(25L, 50L, 75L),
      s"empty pin was reused over a non-degenerate frame: $recovered")

    // legacy layouts (pre-sibling builds) carry the pin INSIDE the dir
    val outLegacy = TestDirs.tmp("sidecar_legacy").toFile.getAbsolutePath
    val legacy = Seq(40L, 80L)
    ShardWriter.writeShardsPinned(df, outLegacy, "doc_id", legacy)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outLegacy, "_graft_shard_bounds"),
      (legacy.mkString(",") + "\n").getBytes("UTF-8"))
    assert(ShardWriter.readBoundsSidecar(spark, outLegacy).contains(legacy),
      "legacy in-dir sidecar not read")
    assert(ShardWriter.writeShardsDerived(df, outLegacy, "doc_id", 4)
      == legacy, "legacy pin not reused by a derived re-write")
    // the migration is crash-safe: the derived re-write materialized
    // the SIBLING pin (writeBoundsSidecar runs BEFORE the data
    // overwrite on the pinned path, and its idempotence check must
    // consult the sibling only — a legacy-fallback match would skip
    // the write and the overwrite would then delete the only pin).
    // The in-dir copy is gone with the overwrite; the sibling carries
    // the pin from here on.
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      outLegacy + "._graft_shard_bounds")),
      "derived re-write over a legacy layout did not materialize the " +
        "sibling pin — a crash mid-overwrite would have lost it")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      outLegacy, "_graft_shard_bounds")),
      "data overwrite should have cleared the legacy in-dir pin")
    assert(ShardWriter.readBoundsSidecar(spark, outLegacy).contains(legacy),
      "sibling pin does not carry the legacy boundaries")

    // deleting the LAYOUT is the reset for a new snapshot: the orphaned
    // sibling pin must be discarded, not silently reused — a grown
    // corpus re-pinned to the deleted snapshot's cuts piles every new
    // high key into the last shard
    def deleteTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteTree)
      f.delete(): Unit
    }
    deleteTree(new java.io.File(out))
    val grown = (1L to 1000L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val rebounds = ShardWriter.writeShardsDerived(grown, out, "doc_id", 4)
    assert(rebounds !== bounds,
      "rebuild over a deleted layout reused the stale sibling pin")
    assert(rebounds === Seq(250L, 500L, 750L),
      s"rebuild did not re-derive from the grown snapshot: $rebounds")
  }
}
