package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.AudioSink
import java.nio.file.{Files, Paths}

class SinkBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("S9/S10: overwrite-with-backup, idempotent backup, restore") {
    import spark.implicits._
    val dir = Files.createTempDirectory("audio_sink")
    val backupRoot = dir.resolve("_backup").toString
    val f = dir.resolve("a.pcm")
    Files.write(f, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val trimmed = Seq((f.toString, Seq(0.5f, -0.5f)))
      .toDF("path", "samples")
    AudioSink.overwriteWithBackup(trimmed, backupRoot)
    // file now holds the 2 trimmed samples
    assert(AudioSink.bytesToFloats(Files.readAllBytes(f)).toSeq ==
      Seq(0.5f, -0.5f))
    // backup holds the original bytes (tree-mirrored under backupRoot)
    val backup = Paths.get(backupRoot,
      f.toAbsolutePath.normalize.toString.stripPrefix("/"))
    assert(Files.readAllBytes(backup).toSeq ==
      Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    // second overwrite must NOT clobber the original backup
    AudioSink.overwriteWithBackup(
      Seq((f.toString, Seq(9f))).toDF("path", "samples"), backupRoot)
    assert(Files.readAllBytes(backup).toSeq ==
      Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    // restore brings the original back and consumes the backup
    val restored = AudioSink.restore(Seq(f.toString), backupRoot)
    assert(restored == Seq(f.toString))
    assert(Files.readAllBytes(f).toSeq == Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    assert(!Files.exists(backup))
    // restoring again is a no-op
    assert(AudioSink.restore(Seq(f.toString), backupRoot).isEmpty)
  }

  test("same-named files in different dirs get distinct backups " +
    "and faithful restores") {
    import spark.implicits._
    val dir = Files.createTempDirectory("audio_sink_collide")
    val backupRoot = dir.resolve("_backup").toString
    val d1 = Files.createDirectories(dir.resolve("Psalms"))
    val d2 = Files.createDirectories(dir.resolve("Genesis"))
    val f1 = d1.resolve("ch01.pcm")
    val f2 = d2.resolve("ch01.pcm") // same basename, different dir
    Files.write(f1, Array[Byte](1, 1, 1, 1))
    Files.write(f2, Array[Byte](2, 2, 2, 2))
    val trimmed = Seq(
      (f1.toString, Seq(0.25f)), (f2.toString, Seq(0.75f)))
      .toDF("path", "samples")
    AudioSink.overwriteWithBackup(trimmed, backupRoot)
    // both files overwritten with their own samples
    assert(AudioSink.bytesToFloats(Files.readAllBytes(f1)).toSeq ==
      Seq(0.25f))
    assert(AudioSink.bytesToFloats(Files.readAllBytes(f2)).toSeq ==
      Seq(0.75f))
    // restore brings EACH original back — the basename-keyed scheme lost
    // f2's original here (f1's backup shadowed it)
    val restored = AudioSink.restore(Seq(f1.toString, f2.toString),
      backupRoot)
    assert(restored.toSet == Set(f1.toString, f2.toString))
    assert(Files.readAllBytes(f1).toSeq == Seq[Byte](1, 1, 1, 1))
    assert(Files.readAllBytes(f2).toSeq == Seq[Byte](2, 2, 2, 2))
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val sf = "/root/testdata/sf0.001"
    val s2 = spark.newSession() // warehouse.dir is static; use default
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    s2.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val joined = s2.table("li_bucketed")
      .join(s2.table("ord_bucketed"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the key ⇒ sort-merge join without any
    // shuffle exchange — the co-located-join layout for repeated joins
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"))
    assert(joined.count() > 0)
    s2.sql("DROP TABLE li_bucketed")
    s2.sql("DROP TABLE ord_bucketed")
  }
}
