package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("banded containment equals the naive theta-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 50))
      .toDF("pid", "x")
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 45
      (i.toLong, lo, lo + rnd.nextDouble() * 8) // spans multiple bands
    }.toDF("iid", "lo", "hi")

    val naive = points.join(intervals,
      col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (width <- Seq(0.5, 1.0, 4.0, 16.0)) {
      val banded = RangeJoin.pointInInterval(points, "x", intervals,
        "lo", "hi", bandWidth = width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == naive, s"bandWidth=$width")
    }
    assert(naive.nonEmpty)
  }

  test("banded plan is a hash join, not nested-loop") {
    import spark.implicits._
    val points = (1 to 100).map(i => (i.toLong, i * 0.5)).toDF("pid", "x")
    val intervals = (1 to 10).map(i => (i.toLong, i * 5.0, i * 5.0 + 2))
      .toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    assert(!plan.contains("NestedLoop"))
  }

  test("boundary semantics: lo inclusive, hi exclusive, across bands") {
    import spark.implicits._
    val points = Seq((1L, 2.0), (2L, 4.0), (3L, 3.999999)).toDF("pid", "x")
    val intervals = Seq((10L, 2.0, 4.0)).toDF("iid", "lo", "hi")
    val hits = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi")
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 3L)) // 4.0 excluded (half-open)
  }

  test("hi just above a band boundary keeps points in [boundary, hi)") {
    import spark.implicits._
    // hi = 2 + 1e-10 sits within 1e-9 above the band-2 boundary: the old
    // floor((hi - 1e-9)/width) top band under-counted to band 1 and
    // silently dropped the point at 2.00000000005.
    val points = Seq((1L, 2.00000000005), (2L, 1.5)).toDF("pid", "x")
    val intervals = Seq((10L, 1.0, 2.0 + 1e-10)).toDF("iid", "lo", "hi")
    val hits = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi")
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L))
  }
}
