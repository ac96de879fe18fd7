package graft.ops

import org.apache.spark.sql.Dataset
import java.io.{ByteArrayOutputStream, IOException}

/** X12/X13: external-process operators (the reference shells out to
  * FFmpeg for lossless trim `-ss/-t -acodec copy` and `silenceremove`
  * filtering, scripts/audio_trimmer_interface.py:37-131).
  *
  * Spark-first shape: one process per row inside `mapPartitions` —
  * executor-local, no driver involvement, binary-safe stdin/stdout with
  * a writer thread (a single-threaded write→read of both pipes
  * deadlocks once either OS buffer fills). Process stderr is discarded;
  * a non-zero exit raises, failing the task (Spark's task retry is the
  * retry policy).
  *
  * The container has no ffmpeg, so tests exercise the operator with
  * coreutils; production swaps argv only.
  */
object PipeOp {

  /** Run `argv` once per row, feeding `content` on stdin and returning
    * stdout bytes. `argvFor` lets the command depend on the row (e.g.
    * per-file trim offsets).
    */
  def pipeBinary[K](ds: Dataset[(K, Array[Byte])], argvFor: K => Seq[String])
      (implicit ev: org.apache.spark.sql.Encoder[(K, Array[Byte])])
  : Dataset[(K, Array[Byte])] =
    ds.mapPartitions { rows =>
      rows.map { case (key, content) =>
        key -> runProcess(argvFor(key),
          if (content == null) Array.empty[Byte] else content)
      }
    }

  /** Binary-safe single process invocation. */
  def runProcess(argv: Seq[String], input: Array[Byte]): Array[Byte] = {
    val pb = new ProcessBuilder(argv: _*)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val proc = pb.start()
    val writer = new Thread(() => {
      try {
        proc.getOutputStream.write(input)
        proc.getOutputStream.close()
      } catch { case _: IOException => /* consumer exited early */ }
    })
    writer.setDaemon(true)
    writer.start()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    val in = proc.getInputStream
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    writer.join()
    val code = proc.waitFor()
    if (code != 0)
      throw new IOException(s"pipe process exited $code: ${argv.mkString(" ")}")
    out.toByteArray
  }
}
