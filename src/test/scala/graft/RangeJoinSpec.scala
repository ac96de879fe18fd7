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

  test("pointInIntervalAggregated: duplicate intervals, rows identical " +
      "to naive join+agg, points aggregated once per distinct interval") {
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val points = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 10))
      .toDF("pid", "x")
    // 200 interval rows over only 5 DISTINCT (lo, hi) pairs — the
    // duplicated-interval regime where the direct join is quadratic
    val intervals = (1 to 200).map { i =>
      val k = i % 5
      (i.toLong, k * 2.0, k * 2.0 + 1.5)
    }.toDF("iid", "lo", "hi")

    val got = RangeJoin.pointInIntervalAggregated(points, "x", intervals,
        "lo", "hi",
        aggs = Seq(count(lit(1)).as("n"), sum(col("x")).as("sx")))
      .select("iid", "n", "sx").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet

    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") < col("hi"))
      .groupBy("iid").agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    assert(got == naive)
    assert(got.size == 200) // every duplicate interval row got its agg

    // left join keeps empty intervals with null aggs
    val far = Seq((999L, 500.0, 501.0)).toDF("iid", "lo", "hi")
    val left = RangeJoin.pointInIntervalAggregated(points, "x",
        intervals.union(far), "lo", "hi",
        aggs = Seq(count(lit(1)).as("n")), joinType = "left")
    assert(left.count() == 201)
    assert(left.filter(col("iid") === 999L).collect().head.isNullAt(
      left.columns.indexOf("n")))

    // plan shape: both the probe and the re-attach broadcast
    val plan = RangeJoin.pointInIntervalAggregated(points, "x", intervals,
        "lo", "hi", aggs = Seq(count(lit(1)).as("n")))
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2, plan.take(600))
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
