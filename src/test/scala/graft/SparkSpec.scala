package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (one JVM-wide session, lazy). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}

/** Spec temp dirs, recursively deleted when the test JVM exits. */
object TestDirs {
  def tmp(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del))
        f.delete(): Unit
      }
      del(p.toFile)
    }
    p
  }
}
