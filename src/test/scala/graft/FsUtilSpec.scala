package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import graft.io.FsUtil

/** The streaming ingests' "does a prior layout exist" probe: its
  * verdict must agree with what `spark.read.parquet` will accept —
  * Spark's InMemoryFileIndex hides `.`-prefixed names UNCONDITIONALLY
  * and `_`-prefixed names only without `=`, so any divergence here is
  * a tree the probe calls data but the read wedges on (or vice versa).
  */
class FsUtilSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fsOf(dir: java.nio.file.Path) = {
    val p = new Path(dir.toString)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def mkFile(dir: java.nio.file.Path, rel: String): Unit = {
    val f = dir.resolve(rel)
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3)): Unit
  }

  test("empty tree / _SUCCESS-only tree / absent root report no data") {
    val d = TestDirs.tmp("fsutil_empty")
    val (fs, p) = fsOf(d)
    assert(FsUtil.hasDataFiles(fs, p) === false, "empty root")
    mkFile(d, "_SUCCESS")
    mkFile(d, "_graft_ivf_stamp")
    assert(FsUtil.hasDataFiles(fs, p) === false, "metadata-only root")
    assert(FsUtil.hasDataFiles(fs,
      new Path(d.toString + "_never_created")) === false, "absent root")
  }

  test("data under partition dirs is found; _batch= keying included") {
    val d = TestDirs.tmp("fsutil_part")
    val (fs, p) = fsOf(d)
    mkFile(d, "_batch=0/cell=3/part-0.parquet")
    assert(FsUtil.hasDataFiles(fs, p) === true)
  }

  test("dot-prefixed dirs are hidden even WITH '=' — Spark filter " +
    "parity") {
    // Spark's InMemoryFileIndex filters ALL '.'-prefixed names; a tree
    // whose only files sit under `.x=1/` reads as "Unable to infer
    // schema", so the probe must call it empty too (r17 ADVICE)
    val d = TestDirs.tmp("fsutil_dot")
    val (fs, p) = fsOf(d)
    mkFile(d, ".x=1/part-0.parquet")
    mkFile(d, ".hidden/part-1.parquet")
    mkFile(d, "_nodata/part-2.parquet")
    assert(FsUtil.hasDataFiles(fs, p) === false)
    // and the verdict matches Spark's: the read refuses this tree
    intercept[Exception] { spark.read.parquet(d.toString).schema }
    // dot-prefixed FILES are hidden as well
    mkFile(d, "_batch=0/.part-0.parquet.crc")
    assert(FsUtil.hasDataFiles(fs, p) === false)
    // one visible file flips the verdict
    mkFile(d, "_batch=0/part-0.parquet")
    assert(FsUtil.hasDataFiles(fs, p) === true)
  }
}
