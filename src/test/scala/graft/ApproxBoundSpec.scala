package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quantitative defense-in-depth for q76_approx_distinct.
  *
  * The driver-facing query reduces the HLL++ sketch to tolerance
  * booleans so it can hash-match a DuckDB oracle; this spec keeps the
  * raw |approx - exact| / exact bound asserted directly, so a future
  * edit that loosens the in-query tolerance (or breaks the sketch
  * plumbing entirely) fails here even though the booleans would still
  * render as TRUE.
  */
class ApproxBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct sits within 3x rsd of exact") {
    val row = graft.queries.Coverage
      .approxDistinctQuery(spark, sf, withApprox = true)
      .collect().head
    val exactParts = row.getAs[Long]("exact_parts")
    val exactOrders = row.getAs[Long]("exact_orders")
    val approxParts = row.getAs[Long]("approx_parts")
    val approxOrders = row.getAs[Long]("approx_orders")
    assert(exactParts > 0 && exactOrders > 0)
    // default rsd 0.05; 3x absorbs the sketch tail, still catches a
    // wrong plan (off by orders of magnitude, not percent)
    assert(math.abs(approxParts - exactParts).toDouble / exactParts <= 0.15,
      s"approx_parts=$approxParts exact_parts=$exactParts")
    assert(math.abs(approxOrders - exactOrders).toDouble / exactOrders <= 0.15,
      s"approx_orders=$approxOrders exact_orders=$exactOrders")
  }

  test("driver-facing q76 shape: booleans true, exact columns only") {
    val df = graft.queries.Coverage.approxDistinctQuery(spark, sf)
    assert(df.columns.toSeq == Seq("exact_parts", "exact_orders",
      "parts_within_tol", "orders_within_tol"))
    val row = df.collect().head
    assert(row.getAs[Boolean]("parts_within_tol"))
    assert(row.getAs[Boolean]("orders_within_tol"))
  }
}
