package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.PrefixSum

/** The two-level exclusive prefix sum must be EXACTLY the single-window
  * form — it exists to bound task sizes, not to approximate — including
  * on skewed strata, across chunk boundaries, and for every chunkSize.
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def referenceOf(rows: Seq[(String, Long, Long)])
  : Map[(String, Long), Long] = {
    val w = Window.partitionBy("part").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.toDF("part", "k", "v")
      .withColumn("p", sum($"v").over(w) - $"v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
  }

  private def distributedOf(rows: Seq[(String, Long, Long)],
      chunkSize: Long): Map[(String, Long), Long] =
    PrefixSum.exclusive(rows.toDF("part", "k", "v").repartition(7),
      "part", "k", "v", "p", chunkSize)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap

  test("matches the single-window form on a 90%-one-stratum skewed " +
    "corpus, for chunk sizes spanning sub-row to super-corpus") {
    val rnd = new scala.util.Random(42)
    // 90% "en" — the skew shape the decomposition exists for; sparse,
    // shuffled keys so chunks have variable occupancy (holes included)
    val rows = rnd.shuffle((0 until 2000).toList).map { i =>
      val part = if (i % 10 == 0) s"s${i % 3}" else "en"
      (part, i.toLong * 13 + 5, rnd.nextInt(4000).toLong)
    }
    val expect = referenceOf(rows)
    for (cs <- Seq(1L, 7L, 64L, 8192L, 1000000L)) {
      assert(distributedOf(rows, cs) == expect, s"chunkSize=$cs")
    }
  }

  test("edge shapes: empty input, one row, one stratum, all keys in " +
    "one chunk, each key its own chunk") {
    assert(distributedOf(Nil, 16) == Map.empty)
    assert(distributedOf(Seq(("a", 9L, 5L)), 16) ==
      Map(("a", 9L) -> 0L))
    val one = (0L until 50L).map(k => ("only", k, k + 1))
    assert(distributedOf(one, 1) == referenceOf(one))
    assert(distributedOf(one, 1000) == referenceOf(one))
  }

  test("negative keys stay ordered across the div-truncation boundary") {
    val rows = Seq(("a", -9000L, 3L), ("a", -5L, 7L), ("a", -1L, 11L),
      ("a", 0L, 13L), ("a", 8191L, 17L), ("a", 8192L, 19L))
    assert(distributedOf(rows, 8192) == referenceOf(rows))
  }
}
