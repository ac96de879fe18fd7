package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** S9/S10: audio overwrite sink with backup/restore
  * (scripts/hebrew_audio_trimmer.py:89-103, 184, 249, 480-502).
  *
  * Executor-side `foreachPartition` filesystem effects: backup-first
  * (idempotent — skip if the backup exists, mirroring the reference's
  * copy-before-modify), then overwrite samples in place. Restore copies
  * the backup back and removes it. PCM is written as raw little-endian
  * float32 (the container has no codec; a production build swaps the
  * byte encoding for an encoder call — the partition/IO shape is
  * identical).
  */
object AudioSink {

  /** Backups mirror the FULL source tree under `backupRoot`: distinct
    * source paths can never collide, so two same-named files in different
    * directories (the norm in per-book chapter corpora) get distinct
    * backups. Keying by basename alone would silently overwrite-without-
    * backup the second file — unacceptable in a destructive sink.
    */
  private def backupPathFor(path: String, backupRoot: String): String = {
    val abs = Paths.get(path).toAbsolutePath.normalize
    Paths.get(backupRoot, abs.toString.stripPrefix("/")).toString
  }

  private def floatsToBytes(samples: Seq[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(samples.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putFloat)
    bb.array()
  }

  def bytesToFloats(bytes: Array[Byte]): Array[Float] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 4)(bb.getFloat)
  }

  /** Overwrite each file with its (trimmed) samples, backing up the
    * original first. Input rows: (path STRING, samples ARRAY<FLOAT>).
    */
  def overwriteWithBackup(df: DataFrame, backupRoot: String): Unit = {
    df.select(col("path"), col("samples")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val path = r.getString(0)
          val samples = r.getSeq[Float](1)
          val backup = Paths.get(backupPathFor(path, backupRoot))
          val target = Paths.get(path)
          Files.createDirectories(backup.getParent)
          if (!Files.exists(backup)) // idempotent: first backup wins
            Files.copy(target, backup, StandardCopyOption.COPY_ATTRIBUTES)
          Files.write(target, floatsToBytes(samples))
        }
    }
  }

  /** Restore originals from the backup mirror; removes consumed backups
    * and returns the restored paths.
    */
  def restore(paths: Seq[String], backupRoot: String): Seq[String] =
    paths.flatMap { path =>
      val backup = Paths.get(backupPathFor(path, backupRoot))
      if (Files.exists(backup)) {
        Files.copy(backup, Paths.get(path),
          StandardCopyOption.REPLACE_EXISTING)
        Files.delete(backup)
        Some(path)
      } else None
    }
}
