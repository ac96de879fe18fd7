package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe distributed prefix sums.
  *
  * The naive form — `sum(v).over(Window.partitionBy(stratum)
  * .orderBy(key))` — routes EVERY row of a stratum through one window
  * task: a real training corpus is ~80–90% one language, so at 100 TB
  * the dominant stratum serializes tens of TB through a single task
  * (SURVEY §7.4-1's "never a window over a global order" rule, hit
  * via a skewed partition key instead of a missing one).
  *
  * This is the classic two-level decomposition instead: an exclusive
  * prefix sum is exactly
  *
  * {{{ prefix(row) = chunkOffset(stratum, chunk) + localPrefix(row) }}}
  *
  * where `chunk = key div chunkSize` (monotone in `key`, so
  * (stratum, chunk ASC, key ASC) ≡ (stratum, key ASC)):
  *
  *  1. per-(stratum, chunk) subtotals — an ordinary hash aggregation,
  *     map-side partial, fully parallel;
  *  2. running offsets over the SUBTOTALS — still one window task per
  *     stratum, but over n/chunkSize rows of three narrow columns
  *     instead of n full-width document rows (chunkSize = 8192 turns a
  *     10¹¹-row stratum into a ~10⁷-row bookkeeping frame, ~100s of MB
  *     through the serial task instead of tens of TB);
  *  3. offsets join back on (stratum, chunk) and a window partitioned
  *     by (stratum, chunk) adds the local running sum — parallel
  *     across chunks, each task bounded by chunkSize rows regardless
  *     of stratum skew. The join and the local window share the same
  *     (stratum, chunk) partitioning, so the big side shuffles once.
  *
  * The decomposition is EXACT — identical results to the single-window
  * form (the q97/q106/q119 oracles did not change when the packing
  * stage switched to this), it just bounds every full-width task.
  */
object PrefixSum {

  /** Exclusive prefix sum of `valueCol` over rows ordered by `orderCol`
    * within each `partCol` stratum, returned as `outCol` (long).
    *
    * `orderCol` must be an integral key, unique within its stratum
    * (ties would make "exclusive prefix" ill-defined in any
    * implementation). Any long range works — `div` truncation is
    * monotone — but the intended use is a non-negative id.
    *
    * `chunkSize` bounds the rows any full-width task sees; the serial
    * per-stratum work shrinks by the same factor. 8192 keeps the
    * subtotal frame ≤ ~0.01% of the corpus while leaving chunks large
    * enough that the local windows amortize their task setup.
    */
  def exclusive(df: DataFrame, partCol: String, orderCol: String,
      valueCol: String, outCol: String, chunkSize: Long = 8192L)
  : DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive (got $chunkSize)")
    val chunked = df.withColumn("__ps_chunk",
      expr(s"CAST(`$orderCol` AS BIGINT) div $chunkSize"))
    val subtotals = chunked
      .groupBy(col(partCol), col("__ps_chunk"))
      .agg(sum(col(valueCol)).as("__ps_tot"))
    // the ONLY per-stratum-serial step, over the reduced subtotal frame
    val wChunks = Window.partitionBy(col(partCol)).orderBy(col("__ps_chunk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = subtotals
      .withColumn("__ps_off",
        sum(col("__ps_tot")).over(wChunks) - col("__ps_tot"))
      .select(col(partCol), col("__ps_chunk"), col("__ps_off"))
    // parallel across (stratum, chunk); task size bounded by chunkSize
    val wLocal = Window.partitionBy(col(partCol), col("__ps_chunk"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked.join(offsets, Seq(partCol, "__ps_chunk"))
      .withColumn(outCol,
        (col("__ps_off") + sum(col(valueCol)).over(wLocal) - col(valueCol))
          .cast("long"))
      .drop("__ps_chunk", "__ps_off")
  }
}
