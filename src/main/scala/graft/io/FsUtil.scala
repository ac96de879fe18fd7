package graft.io

/** Shared IO for the engine's tiny protocol files — stamp sidecars,
  * boundary pins, fold manifests. One read-fully primitive instead of a
  * per-module copy, so stream-semantics fixes (short reads, charset)
  * propagate everywhere at once. These files are bytes-to-low-KBs by
  * contract; this is NOT a data-file reader.
  */
object FsUtil {

  /** The file's full content as trimmed UTF-8 text; None when absent. */
  def readFullyUtf8(fs: org.apache.hadoop.fs.FileSystem,
      f: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(bytes.toString("UTF-8").trim)
      } finally in.close()
    }
}
