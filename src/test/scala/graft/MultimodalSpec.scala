package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{GrammarPipeline, Multimodal}
import graft.ops.Multimodal.MediaRow

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("grammar pipeline: NFC, bitmaps, undiacritized, validation (real ops)") {
    import spark.implicits._
    // decomposed shin+dagesh etc: NFC must compose; bitmap marks nikud
    val composed = "שָׁלוֹם"
    val df = Seq(("t1", composed), ("t2", "plain latin"), ("t3", "רע�ע"))
      .toDF("id", "raw")
    val out = df.select(col("id"),
      GrammarPipeline.undiacritized(col("raw")).as("undia"),
      GrammarPipeline.nikudBitmap(col("raw")).as("nikud"),
      GrammarPipeline.dageshBitmap(col("raw")).as("dagesh"),
      GrammarPipeline.validation(col("raw")).as("v"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(out("t1").getString(1) == "שלום")
    val nikud = out("t1").getSeq[Byte](2)
    assert(nikud.sum > 0) // diacritics marked
    assert(out("t1").getStruct(4).getBoolean(2)) // hebrew present
    assert(!out("t2").getStruct(4).getBoolean(2))
    assert(!out("t3").getStruct(4).getBoolean(1)) // U+FFFD trips check
    assert(out("t2").getStruct(4).getBoolean(1))
  }

  test("hebrew token filter keeps only Hebrew tokens") {
    import spark.implicits._
    val r = Seq("שלום abc עולם 123").toDF("t")
      .select(GrammarPipeline.hebrewTokensOnly(col("t"))).collect().head
    assert(r.getString(0) == "שלום עולם")
  }

  test("page split fans one binary into page rows with byte slices") {
    import spark.implicits._
    val content = Array.fill[Byte](2500)(7)
    val df = Seq(("doc1", content)).toDF("book", "content")
    val pages = GrammarPipeline.pageSplit(df, "content", pageBytes = 1024)
    val rows = pages.select("page_number", "page_image").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Array[Byte]](1).length).toSeq == Seq(1024, 1024, 452))
  }

  test("full grammar pipeline run produces validated page rows") {
    import spark.implicits._
    val df = Seq(("doc1", "אבג".getBytes("UTF-8"))).toDF("book", "content")
    val out = GrammarPipeline.run(df).collect()
    assert(out.length == 1)
    val row = GrammarPipeline.run(df)
      .select("text", "validation.hebrew_character_presence").collect().head
    assert(row.getString(0).startsWith("עמוד "))
    assert(row.getBoolean(1))
  }

  test("multimodal decode/resize/frame-sample shapes") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1, "image", Array.fill[Byte](100)(1)),
      MediaRow(2, "audio", Array.fill[Byte](50)(2)),
      MediaRow(3, "video", Array.fill[Byte](200)(3))).toDS()
    val decoded = Multimodal.decode(rows).toDF()
    assert(decoded.count() == 3)
    val img = decoded.filter(col("kind") === "image").collect().head
    assert(img.getAs[Int]("width") >= 64)
    val resized = Multimodal.resizeMeta(decoded, 128)
      .filter(col("kind") === "image").collect().head
    assert(resized.getAs[Int]("out_width") <= 128 &&
      resized.getAs[Int]("out_height") <= 128)
    val frames = Multimodal.sampleFrames(decoded, 10)
    val vid = frames.filter(col("kind") === "video")
    assert(vid.count() > 0)
    assert(vid.select(max(col("frame_idx"))).collect().head.getInt(0) <
      decoded.filter(col("kind") === "video").collect()
        .head.getAs[Int]("n_frames"))
  }

  test("decodePcm: real float32-LE round trip with exact RMS") {
    import spark.implicits._
    // 4 samples: 0.5, -0.5, 1.0, 0.0 → rms = sqrt(1.5/4)
    val bytes = {
      val bb = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Seq(0.5f, -0.5f, 1.0f, 0.0f).foreach(bb.putFloat)
      bb.array()
    }
    val out = Multimodal.decodePcm(
      Seq(MediaRow(7, "audio", bytes), MediaRow(8, "audio", Array.empty))
        .toDS(), sampleRate = 4).collect().map(d => d.media_id -> d).toMap
    assert(out(7L).n_samples == 4)
    assert(out(7L).duration == 1.0)
    assert(math.abs(out(7L).rms - math.sqrt(1.5 / 4)) < 1e-12)
    assert(out(8L).n_samples == 0 && out(8L).rms == 0.0)
  }

  test("embed is deterministic and cosine-joinable") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1, "image", Array.fill[Byte](100)(1)),
      MediaRow(2, "image", Array.fill[Byte](100)(1)),
      MediaRow(3, "image", Array[Byte](9, 9, 9))).toDS()
    val emb = Multimodal.embed(rows)
    val vecs = emb.orderBy("media_id").collect()
      .map(_.getSeq[Float](2))
    assert(vecs(0) == vecs(1)) // same bytes → same embedding
    assert(vecs(0) != vecs(2))
    val knn = graft.ops.Similarity.knnCosine(emb, "media_id", "embedding",
      queryId = 1L, k = 2).collect()
    assert(knn.head.getLong(0) == 2) // identical content ranks first
  }
}
