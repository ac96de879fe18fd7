package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (nearest prior event): for each left row, attach the
  * payload of the latest right row with the same key and
  * `right.ts <= left.ts`.
  *
  * Spark-first composition (SURVEY.md §7.3 preference (a)): tag both
  * sides, union, and carry the payload forward with
  * `last(payload, ignoreNulls)` over an ordered per-key window — ONE
  * hash shuffle on the key, linear work, no nested-loop or range scan.
  * At equal timestamps the right row sorts first (side 0 < 1), matching
  * inclusive `>=` as-of semantics (DuckDB ASOF JOIN equivalent).
  *
  * Scale: state per window frame is the running payload only; skewed
  * keys fall to AQE; no broadcast needed on either side.
  */
object AsOfJoin {

  /** `payloadCols` must not collide with left column names.
    *
    * The payload travels as ONE struct column: carrying each column
    * independently with `last(_, ignoreNulls)` could stitch a "torn"
    * match from different right rows when payloads contain nulls (and
    * would resurrect an older non-null value over a genuinely-null
    * latest one) — the whole-row struct matches DuckDB ASOF semantics.
    *
    * Ties: two right rows with identical (key, ts) would otherwise be
    * picked by shuffle arrival order — run-to-run nondeterminism. The
    * window ordering therefore appends the payload's ORDERABLE columns
    * (value-based, shuffle-independent): among equal-ts right rows the
    * LARGEST orderable-payload tuple (field order, nulls-first) wins, a
    * total order on the output — identical payload rows are
    * indistinguishable, so either pick yields the same bytes.
    * Non-orderable payload columns (maps) are carried but excluded from
    * the tie-break; ties that differ ONLY in non-orderable columns
    * remain arrival-order picks — the price of supporting map payloads
    * at all (a window cannot order by a map).
    */
  def nearestPrior(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, payloadCols: Seq[String])
  : DataFrame = {
    val lTagged = left
      .withColumn("_ts", col(leftTime).cast("double"))
      .withColumn("_side", lit(1))
    val rTagged = right
      .select(keyCols.map(col) :+
        struct(payloadCols.map(col): _*).as("_payload") :+
        col(rightTime).cast("double").as("_ts"): _*)
      .withColumn("_side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val tieBreak = payloadCols
      .filter(p => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(p).dataType))
      .map(p => col("_payload").getField(p))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts") +: col("_side") +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_payload",
      last(col("_payload"), ignoreNulls = true).over(w))
    val unpacked = payloadCols.foldLeft(carried) { (df, p) =>
      df.withColumn(p, col("_payload").getField(p))
    }
    unpacked.filter(col("_side") === 1).drop("_ts", "_side", "_payload")
  }
}
