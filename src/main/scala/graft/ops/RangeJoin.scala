package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J6 generalized: banded point-in-interval join. A plain theta-join
  * `p.x ∈ [i.lo, i.hi)` plans as a nested-loop scan; deriving an integer
  * band key on both sides turns it into an equi-join (hash, broadcast-
  * able, AQE-eligible) with a residual range predicate — O(points +
  * intervals·bands) instead of O(points·intervals).
  *
  * `bandWidth` trades replication for selectivity: intervals replicate
  * once per band they overlap, so pick a width near the typical interval
  * length (exact replication factor = ⌈len/width⌉+1 worst case).
  *
  * SCALE CAVEAT (measured: the round-7 sf1.0 ratio run caught q12's
  * direct form at 247× on 10× data): the equi-join is linear only while
  * per-band occupancy stays bounded. If the band key domain does NOT
  * grow with the data — duplicate intervals, or points densifying over
  * a fixed range — the per-band product grows quadratically. When many
  * intervals are IDENTICAL, dedupe them before the join, aggregate the
  * points per distinct interval, and broadcast the (tiny) aggregate
  * back onto the duplicates afterwards: identical rows, O(points +
  * intervals). That shape is `pointInIntervalAggregated` below —
  * q12_range_join routes through it, PlanRegressionSpec gates the plan.
  */
object RangeJoin {

  /** Join `points` (value column `x`) to `intervals` ([lo, hi) columns)
    * on containment, optionally with extra equi-keys joined first.
    */
  def pointInInterval(points: DataFrame, x: String,
      intervals: DataFrame, lo: String, hi: String,
      equiKeys: Seq[String] = Seq.empty,
      bandWidth: Double = 1.0,
      broadcastIntervals: Boolean = false): DataFrame = {
    val p = points.withColumn("_band",
      floor(col(x) / bandWidth).cast("long"))
    // Top band is floor(hi/bandWidth) — NOT floor((hi-ε)/bandWidth):
    // subtracting an epsilon under-counts the top band when hi sits just
    // above a boundary, silently dropping points in [boundary, hi).
    // When hi lands exactly ON a boundary this replicates one band too
    // many; the residual x < hi predicate cuts those rows — correctness
    // over a marginal replication saving.
    val banded = intervals.withColumn("_band",
      explode(sequence(
        floor(col(lo) / bandWidth).cast("long"),
        greatest(floor(col(hi) / bandWidth).cast("long"),
          floor(col(lo) / bandWidth).cast("long")))))
    // Hint AFTER the explode: a hint below a Generate is not reliably
    // pulled up into the join, and the plan gates need a static
    // BroadcastHashJoin even with AQE off.
    val i = if (broadcastIntervals) broadcast(banded) else banded
    p.join(i, equiKeys :+ "_band")
      .filter(col(x) >= col(lo) && col(x) < col(hi))
      .drop("_band")
  }

  /** The scale-safe form of the caveat above, as an API so the next
    * caller with duplicated intervals doesn't rediscover the quadratic
    * (q12's direct form measured 247x on 10x data at sf1.0): aggregate
    * `points` once per DISTINCT (equiKeys, lo, hi) interval — a bounded
    * group count whenever the interval domain is bounded — then
    * broadcast the tiny aggregate back onto every duplicate interval
    * row. O(points + intervals) instead of O(points x duplicates).
    *
    * `aggs` (non-empty) aggregate the matched points per interval;
    * `intervals` keeps ALL its columns, gaining the agg columns.
    * `joinType` "inner" drops intervals with no matching points;
    * "left" keeps them with null aggregates. `lo`/`hi` column names
    * must not collide with `points` columns.
    */
  def pointInIntervalAggregated(points: DataFrame, x: String,
      intervals: DataFrame, lo: String, hi: String,
      aggs: Seq[Column], equiKeys: Seq[String] = Seq.empty,
      bandWidth: Double = 1.0, joinType: String = "inner"): DataFrame = {
    require(aggs.nonEmpty, "pointInIntervalAggregated needs >= 1 agg")
    val keyCols = equiKeys :+ lo :+ hi
    val distinctIntervals = intervals.select(keyCols.map(col): _*).distinct()
    val perInterval = pointInInterval(points, x, distinctIntervals,
        lo, hi, equiKeys, bandWidth, broadcastIntervals = true)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    intervals.join(broadcast(perInterval), keyCols, joinType)
  }
}
