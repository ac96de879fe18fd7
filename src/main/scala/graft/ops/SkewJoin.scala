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
}
