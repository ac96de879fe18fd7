package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4: AQE covers runtime
  * skew, salting is the static-plan tool when a hot key is known — the
  * reference's analog is Psalms' 150 chapters vs Obadiah's 1).
  *
  * The big side spreads each key over `k` salt buckets (deterministic
  * hash of a spreader column — no rand(), outputs stay reproducible);
  * the small side replicates each row k× via explode. The joined result
  * is row-identical to the unsalted join, but the shuffle distributes a
  * hot key across k reducers instead of one.
  */
object SkewJoin {

  /** Join types whose results survive k× small-side replication: for
    * right/full outer joins each UNMATCHED small-side row would surface
    * k duplicates, so those are rejected.
    */
  private val safeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      spreaderCol: String, k: Int = 8, joinType: String = "inner")
  : DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(safeJoinTypes.contains(jt),
      s"saltedJoin: joinType '$joinType' is not row-identical under k-way " +
        "small-side replication (unmatched small rows duplicate); use " +
        "inner, left, left_semi, or left_anti")
    val bigSalted = big.withColumn("_salt",
      pmod(hash(col(spreaderCol)), lit(k)))
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0), lit(k - 1))))
    bigSalted.join(smallSalted, keyCols :+ "_salt", joinType)
      .drop("_salt")
  }

  /** Per-key salt fanout from the DETECTED skew (r19): one salt bucket
    * per `hotThreshold`-sized slice of the key's estimated row count,
    * at least 2 (a detected hot key must actually spread), capped at
    * the caller's `k`. A key barely over the threshold spreads 2 ways
    * instead of paying the full k× small-side replication; a 10×-the-
    * threshold key uses the cap — the fanout follows the measured skew
    * instead of a fixed constant (the join result is row-identical
    * under ANY fanout; this only sizes the shuffle spread vs the
    * replication cost).
    */
  private[graft] def fanoutFor(estRows: Double, hotThreshold: Long,
      k: Int): Int =
    math.min(k.toLong,
      math.max(2L, math.ceil(estRows / hotThreshold).toLong)).toInt

  /** Salting gated on DETECTED hot keys: sample the big side's keys,
    * estimate per-key counts, and salt ONLY keys whose estimated total
    * exceeds `hotThreshold` — cold keys keep salt 0 and the small side
    * replicates only its hot-key rows, each by the key's OWN
    * [[fanoutFor]] fanout (estimated rows / hotThreshold, ≥2, capped
    * at `k` — so `k` is the fanout CEILING, not a blanket constant).
    * With no hot keys detected this returns the PLAIN join (AQE
    * handles residual runtime skew), so non-skewed workloads never pay
    * any shuffle amplification. The detection pass is one sampled
    * scan+agg of the big side's key columns (column-pruned).
    */
  def saltedJoinHot(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      spreaderCol: String, k: Int = 8, joinType: String = "inner",
      sampleFraction: Double = 0.01, hotThreshold: Long = 1000000L,
      maxHotKeys: Int = 1000): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(safeJoinTypes.contains(jt),
      s"saltedJoinHot: joinType '$joinType' is not row-identical under " +
        "salting; use inner, left, left_semi, or left_anti")
    val sampleCutoff = math.max(1L, (hotThreshold * sampleFraction).toLong)
    // detection runs EXACTLY once: the (≤ maxHotKeys)-row result is
    // collected to the driver and re-ships as a local relation — leaving
    // it lazy would re-execute the sampled scan+agg inside each
    // broadcast of the join plan. `_k` = the key's fanout, derived from
    // its sampled count scaled back to an estimated total
    val fanout = udf((cnt: Long) =>
      fanoutFor(cnt / sampleFraction, hotThreshold, k))
    val hotLocal = big.select(keyCols.map(col): _*)
      .sample(withReplacement = false, sampleFraction, seed = 42)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= sampleCutoff)
      .orderBy(col("_cnt").desc)
      .limit(maxHotKeys)
      .withColumn("_k", fanout(col("_cnt")))
      .drop("_cnt")
    val hotRows = hotLocal.collect()
    if (hotRows.isEmpty) return big.join(small, keyCols, joinType)
    val hotB = broadcast(big.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotRows: _*), hotLocal.schema))
    val bigSalted = big.join(hotB, keyCols, "left")
      .withColumn("_salt",
        when(col("_k").isNotNull, pmod(hash(col(spreaderCol)), col("_k")))
          .otherwise(0))
      .drop("_k")
    val smallSalted = small.join(hotB, keyCols, "left")
      .withColumn("_salt",
        explode(when(col("_k").isNotNull,
          sequence(lit(0), col("_k") - lit(1)))
          .otherwise(array(lit(0)))))
      .drop("_k")
    bigSalted.join(smallSalted, keyCols :+ "_salt", joinType)
      .drop("_salt")
  }
}
