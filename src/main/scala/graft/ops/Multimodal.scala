package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `BINARY` columns + typed metadata, with decode / feature-
  * extract / resize / frame-sample operators.
  *
  * The container ships no codec libraries, so the per-byte decode kernels
  * are deterministic fakes — but the Spark surface is production-shaped:
  * binary in, typed struct/array out, per-partition batch execution
  * (`mapPartitions`, the JVM analog of `mapInPandas` batches), metadata
  * that prunes (decode only rows whose metadata passes filters), and
  * embeddings that feed the [[graft.ops.Similarity]] ANN path.
  *
  * Scale: decode never shuffles (pure per-row projection); frame
  * sampling fans out via `explode(sequence(...))` which Spark pipelines
  * inside the same stage.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  case class DecodedMedia(media_id: Long, kind: String, width: Int,
      height: Int, n_frames: Int, sample_rate: Int, byte_len: Int)

  /** Decode stub (image dims / audio rate / video frames derived
    * deterministically from content bytes). Batch-shaped: one partition
    * iterator in, one out — swap the body for a real codec loop.
    *
    * The fake dimensions hash with the engine's standard portable
    * derivation — the first 60 bits of the md5 digest, the same value
    * DuckDB reads as `CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)`
    * — so the whole decode → resize → frame-sample pipeline is
    * oracle-checkable end-to-end (q70), not rows-only.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val content = if (m.content == null) Array.empty[Byte] else m.content
        md.reset()
        val digest = md.digest(content)
        // top 60 bits of the big-endian first 8 bytes == first 15 hex
        // digits; >>> keeps it non-negative so % and / are sign-safe
        val h = java.nio.ByteBuffer.wrap(digest, 0, 8).getLong >>> 4
        m.kind match {
          case "image" =>
            DecodedMedia(m.media_id, m.kind, (64 + h % 512).toInt,
              (64 + (h / 512) % 512).toInt, 1, 0, content.length)
          case "audio" =>
            DecodedMedia(m.media_id, m.kind, 0, 0, 0,
              if (h % 2 == 0) 16000 else 22050, content.length)
          case _ =>
            DecodedMedia(m.media_id, m.kind, 320, 240, (1 + h % 300).toInt,
              0, content.length)
        }
      }
    }
  }

  case class DecodedPcm(media_id: Long, n_samples: Int, duration: Double,
      rms: Double)

  /** REAL decode for the codec-free format: raw little-endian float32
    * PCM bytes (the format [[graft.io.AudioSink]] writes) → sample
    * count, duration, RMS. Runs for real in CI — no codec library
    * involved — and demonstrates the actual batch decode loop the
    * stubbed codec formats plug into: binary column in, typed row out,
    * one partition iterator per task, zero shuffle.
    */
  def decodePcm(media: Dataset[MediaRow], sampleRate: Int = 16000)
  : Dataset[DecodedPcm] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val samples = graft.io.AudioSink.bytesToFloats(
        if (m.content == null) Array.empty[Byte] else m.content)
      var sumSq = 0.0
      var i = 0
      while (i < samples.length) {
        sumSq += samples(i).toDouble * samples(i).toDouble
        i += 1
      }
      DecodedPcm(m.media_id, samples.length,
        samples.length.toDouble / sampleRate,
        if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length))
    })
  }

  /** Resize: metadata transform (real resize happens in the decode
    * kernel in production; the plan shape — a projection — is identical).
    */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height"), lit(1)))
    decoded
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling: one row per sampled frame index — explode of a
    * bounded sequence, pipelined (no shuffle).
    */
  def sampleFrames(decoded: DataFrame, everyNth: Int): DataFrame =
    decoded.filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))

  /** Feature-extract stub: binary → dense FloatArray embedding derived
    * from the md5 digest (deterministic); production swaps in a vision/
    * audio encoder inside the same mapPartitions batch loop. Output
    * feeds Similarity.knnCosine / lshAnn unchanged.
    */
  def embed(media: Dataset[MediaRow], dim: Int = 16)
  : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        md.reset()
        val digest = md.digest(if (m.content == null) Array.empty[Byte]
          else m.content)
        val vec = Array.tabulate(dim)(i =>
          (digest(i % digest.length).toInt + i * 7) % 128 / 128.0f)
        (m.media_id, m.kind, vec)
      }
    }.toDF("media_id", "kind", "embedding")
  }
}
