package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.audio.AudioOps
import graft.asr.{FakeTranscriber, TranscribeOp}
import graft.io.AudioCatalog
import graft.model.ChapterAudio

class AudioAsrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 10 s of "audio" at 100 Hz: 4 s near-silence then loud. */
  private def syntheticSamples: Seq[Float] = {
    val quiet = Seq.fill(400)(0.01f)
    val loud = (0 until 600).map(i => if (i % 2 == 0) 0.8f else -0.8f)
    quiet ++ loud
  }

  test("rmsSegments: 2s windows, quiet intro then loud") {
    import spark.implicits._
    val df = Seq(("f1", syntheticSamples)).toDF("path", "samples")
    val segs = AudioOps.rmsSegments(df, "samples", "path", sampleRate = 100)
      .orderBy("segment").collect()
    assert(segs.length == 5)
    val rms = segs.map(_.getDouble(2))
    assert(rms(0) < 0.02 && rms(1) < 0.02)
    assert(rms(2) > 0.5 && rms(4) > 0.5)
  }

  test("rmsSegmentsInline matches the exploded aggregation") {
    import spark.implicits._
    val df = Seq(("f1", syntheticSamples)).toDF("path", "samples")
    val inline = df.select(
      AudioOps.rmsSegmentsInline(col("samples"), 100).as("rms"))
      .collect().head.getSeq[Double](0)
    val exploded = AudioOps.rmsSegments(df, "samples", "path", 100)
      .orderBy("segment").collect().map(_.getDouble(2))
    assert(inline.size == exploded.length)
    // exploded path averages float x*x, inline casts to double first —
    // identical to ~1e-7 relative
    inline.zip(exploded).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6) }
  }

  test("suggestTrim: threshold from tail segments, first-exceed - 0.5s") {
    import spark.implicits._
    val df = Seq(("f1", syntheticSamples)).toDF("path", "samples")
    val suggested = df.select(
      AudioOps.suggestTrim(
        AudioOps.rmsSegmentsInline(col("samples"), 100)).as("t"))
      .collect().head.getDouble(0)
    // segments: [q,q,l,l,l]; tail mean≈0.8 → thr≈0.24; first exceed seg 2
    // → start 4.0s − 0.5 = 3.5
    assert(suggested == 3.5)
  }

  test("suggestTrim: all-quiet audio yields null") {
    import spark.implicits._
    val df = Seq(("f1", Seq.fill(1000)(0.0f))).toDF("path", "samples")
    val r = df.select(AudioOps.suggestTrim(
      AudioOps.rmsSegmentsInline(col("samples"), 100)).as("t"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("trimSamples: clamps and slices by seconds") {
    import spark.implicits._
    val df = Seq((Seq(0f, 1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f))).toDF("samples")
    val out = df.select(
      AudioOps.trimSamples(col("samples"), 2, lit(1.0), lit(4.0)).as("s"),
      AudioOps.trimSamples(col("samples"), 2, lit(-5.0), lit(100.0)).as("all"),
      AudioOps.trimSamples(col("samples"), 2, lit(8.0), lit(9.0)).as("empty"))
      .collect().head
    assert(out.getSeq[Float](0) == Seq(2f, 3f, 4f, 5f, 6f, 7f))
    assert(out.getSeq[Float](1).size == 10)
    assert(out.getSeq[Float](2).isEmpty)
  }

  test("upsertConfig: later timestamp wins per key") {
    import spark.implicits._
    val existing = Seq(
      ("a.mp3", 1.0, 100L), ("b.mp3", 2.0, 100L)).toDF("key", "trim_start", "ts")
    val updates = Seq(
      ("a.mp3", 9.9, 200L), ("c.mp3", 3.0, 150L)).toDF("key", "trim_start", "ts")
    val out = AudioOps.upsertConfig(existing, updates).orderBy("key")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("a.mp3", 9.9), ("b.mp3", 2.0), ("c.mp3", 3.0)))
  }

  test("FakeTranscriber through mapPartitions inference operator") {
    import spark.implicits._
    val audio = Seq(
      ChapterAudio("Gen", 1, "g1.mp3", 16000, 10.0, Seq.empty),
      ChapterAudio("Gen", 2, "g2.mp3", 16000, 8.0, Seq.empty)).toDS()
    val ref = Map(
      ("Gen", 1) -> Seq("א", "ב", "ג"),
      ("Gen", 2) -> Seq("ד", "ה"))
    val words = TranscribeOp.transcribe(audio, FakeTranscriber(ref))
      .collect()
      .sortBy(w => (w.chapter, w.seq))
    assert(words.length == 5)
    assert(words.head.text == "א" && words.head.start == 0.0)
    assert(words.head.end == 0.4 && words.head.confidence == 0.9)
    // drop-every-2 leaves 2 of 3 words
    val dropped = TranscribeOp.transcribe(audio,
      FakeTranscriber(ref, dropEvery = 2)).collect()
      .filter(_.chapter == 1)
    assert(dropped.length == 2)
    assert(dropped.map(_.text).sorted.toSeq == Seq("א", "ג"))
  }

  test("decodeWithFallback: first failing codec falls through to next") {
    import spark.implicits._
    val df = Seq(("ok", Array[Byte](1, 2)), ("bad", Array[Byte](9)))
      .toDF("path", "content")
    val primary = (b: Array[Byte]) =>
      if (b.length >= 2) Some(b.map(_.toFloat)) else None
    val fallback = (b: Array[Byte]) => Some(Array(42.0f))
    val out = AudioCatalog.decodeWithFallback(df, Seq(primary, fallback))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Float](2), r.getAs[Int]("codec_attempts"))).toMap
    assert(out("ok")._1 == Seq(1.0f, 2.0f) && out("ok")._2 == 1)
    assert(out("bad")._1 == Seq(42.0f) && out("bad")._2 == 2)
    // total failure → empty samples, all codecs attempted
    val none = AudioCatalog.decodeWithFallback(df,
      Seq((_: Array[Byte]) => None)).collect()
    assert(none.forall(_.getSeq[Float](2).isEmpty))
  }

  test("withFallback: local content preferred, remote fills gaps") {
    import spark.implicits._
    val local = Seq(("Gen", 1, "local1".getBytes))
      .toDF("book", "chapter", "content")
    val remote = Seq(("Gen", 1, "remote1".getBytes),
      ("Gen", 2, "remote2".getBytes)).toDF("book", "chapter", "content")
    val resolved = AudioCatalog.withFallback(local, remote,
      Seq("book", "chapter")).orderBy("chapter").collect()
    assert(resolved.length == 2)
    assert(new String(resolved(0).getAs[Array[Byte]]("content")) == "local1")
    assert(new String(resolved(1).getAs[Array[Byte]]("content")) == "remote2")
  }

  test("AdaptiveTranscriber: retries primary, degrades to fallback") {
    import graft.asr.{AdaptiveTranscriber, Transcriber}
    import graft.model.{ChapterAudio, TranscribedWord}
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky = new Transcriber {
      override def transcribe(a: ChapterAudio): Seq[TranscribedWord] = {
        if (calls.incrementAndGet() < 3)
          throw new RuntimeException("simulated OOM")
        Seq(TranscribedWord(a.book, a.chapter, 1, "ok", 0, 1, 0.9))
      }
    }
    val cpu = FakeTranscriber(Map(("Gen", 1) -> Seq("fallback")),
      confidence = 0.5)
    val audio = ChapterAudio("Gen", 1, "x", 16000, 1.0, Seq.empty)
    // succeeds on 3rd retry of primary
    val ok = AdaptiveTranscriber(flaky, cpu, retries = 3, sleeper = _ => ())
      .transcribe(audio)
    assert(ok.head.text == "ok" && calls.get() == 3)
    // primary always fails → fallback output
    val alwaysBad = new Transcriber {
      override def transcribe(a: ChapterAudio) =
        throw new RuntimeException("OOM")
    }
    val fb = AdaptiveTranscriber(alwaysBad, cpu, retries = 2,
      sleeper = _ => ()).transcribe(audio)
    assert(fb.head.text == "fallback" && fb.head.confidence == 0.5)
  }

  test("AudioCatalog: binaryFile scan + path parse + validity filter") {
    val dir = java.nio.file.Files.createTempDirectory("audio").toFile
    val sub = new java.io.File(dir, "01_Genesis")
    sub.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(sub, "01-Gen_01.mp3").toPath,
      Array.fill[Byte](2048)(42))
    java.nio.file.Files.write(
      new java.io.File(sub, "01-Gen_02.mp3").toPath,
      Array.fill[Byte](10)(1)) // too small → filtered
    val scanned = AudioCatalog.parsePath(
      AudioCatalog.scan(spark, dir.toString))
    assert(scanned.count() == 2)
    val ok = AudioCatalog.valid(scanned).collect()
    assert(ok.length == 1)
    val row = AudioCatalog.parsePath(AudioCatalog.valid(scanned))
      .select("folder", "book_num", "abbr", "chapter").collect().head
    assert(row.getString(0) == "01_Genesis" && row.getString(1) == "01")
    assert(row.getString(2) == "Gen" && row.getInt(3) == 1)
    // decode stub: 2048 bytes → 2048 samples, duration at 16 kHz
    val dec = AudioCatalog.decodeStub(AudioCatalog.valid(scanned)).collect()
    assert(dec.head.getAs[scala.collection.Seq[Float]]("samples")
      .size == 2048)
  }
}
