package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deterministic sharded parquet output — the training-data layout step
  * (generalizes the reference's per-book output tree,
  * `hebrew_alignment_tool.py:152-160`, to a corpus-scale sink).
  *
  * The 100 TB problems this solves:
  *  - **Small files**: a 32k-task shuffle writing 32k×shards tiny files
  *    kills the downstream scan's file-listing. One range partition per
  *    shard ⇒ exactly `numShards` files (+ `maxRecordsPerFile` splits
  *    when a shard legitimately overflows).
  *  - **Determinism**: within-shard sort order and global key order
  *    across shards are always deterministic. Shard BOUNDARIES from
  *    [[writeShards]] are not — Spark's RangePartitioner seeds its
  *    reservoir sample by RDD id, so boundaries drift between runs
  *    (balance holds, membership wiggles at the edges). When the
  *    layout itself must be byte-stable (resumable training, diffable
  *    snapshots — SURVEY.md §7.4 risk 3), use [[writeShardsPinned]]
  *    with explicit boundaries: membership becomes a pure function of
  *    the key.
  *  - **Balance**: range partitioning samples key quantiles, so shards
  *    are near-equal row counts even on skewed keys — a hash layout
  *    can't promise that, and unbalanced shards stall data-parallel
  *    training at the slowest reader.
  */
object ShardWriter {

  /** Write `df` as `numShards` range-sharded files sorted by `keyCol`
    * within each shard.
    */
  def writeShards(df: DataFrame, outDir: String, numShards: Int,
      keyCol: String, maxRecordsPerFile: Long = 0L): Unit = {
    require(numShards > 0, "numShards must be positive")
    df.repartitionByRange(numShards, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(outDir)
  }

  /** Byte-stable sharding: explicit sorted `boundaries` pin shard
    * membership (shard i = count of boundaries < key), written as a
    * `shard=` partitioned tree. Hash-repartitioning on the shard id
    * lands each shard's rows in one task ⇒ one file per shard
    * directory; rows are sorted by key within each file. Re-runs —
    * including over a differently-partitioned upstream — produce the
    * identical layout.
    */
  def writeShardsPinned(df: DataFrame, outDir: String,
      keyCol: String, boundaries: Seq[Long]): Unit = {
    require(boundaries == boundaries.sorted, "boundaries must be sorted")
    // Small boundary lists get the codegen'd when-chain; large ones an
    // array-literal HOF count — the chain is O(N) EXPRESSION DEPTH, and
    // a few thousand boundaries overflow Catalyst's recursive transforms
    // / the 64KB codegen method limit. Identical strict-> semantics.
    val shard =
      if (boundaries.size <= 64)
        boundaries.foldLeft(lit(0)) { (acc, b) =>
          acc + when(col(keyCol) > lit(b), 1).otherwise(0)
        }
      else
        size(filter(typedLit(boundaries), b => col(keyCol) > b))
    df.withColumn("shard", shard)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write
      .partitionBy("shard")
      .mode(SaveMode.Overwrite)
      .parquet(outDir)
  }

  /** Derive PINNED boundaries from the data's own exact quantiles —
    * the bridge between [[writeShards]] (balanced but run-dependent
    * boundaries) and [[writeShardsPinned]] (byte-stable but caller-
    * chosen boundaries): compute the key's k/numShards quantiles ONCE,
    * persist them alongside the layout, and every later (re-)write
    * against the same snapshot produces the identical balanced layout.
    * Fixed hand-picked boundaries (the q95/q119 demo's Seq(40,80,160))
    * stop balancing the moment the key range outgrows them — at 10×
    * the corpus the last shard would swallow ~everything and its one
    * writer task becomes the job (the same single-task class as the
    * packing window this round fixed); quantile-derived boundaries
    * track the distribution at any scale.
    *
    * Exact (sort-based) per-partition quantiles would be a full sort;
    * this uses `approx_percentile` at `accuracy` (default 1/10000 —
    * rank error ≤ n/10000, so shard sizes balance within ~0.03% at
    * numShards ≤ 32). Byte-stability comes from PINNING, not from the
    * sketch: compute the boundaries ONCE per snapshot and persist them
    * with the layout — beyond ~`accuracy` rows the Greenwald-Khanna
    * summaries compress, and their final merge follows shuffle fetch
    * order, so RE-deriving boundaries on the same data is not
    * guaranteed to reproduce them cut-for-cut (membership from any
    * one pinned boundary list is always a pure function of the key).
    * Heavily duplicated keys can collapse adjacent cuts — the
    * `.distinct` then yields fewer boundaries (and shards) than
    * requested, the correct degeneration when the key has fewer
    * distinct values than shards.
    */
  def boundariesFromQuantiles(df: DataFrame, keyCol: String,
      numShards: Int, accuracy: Int = 10000): Seq[Long] = {
    require(numShards > 1, "numShards must be > 1 to need boundaries")
    val fracs = (1 until numShards).map(_.toDouble / numShards)
    val row = df.select(percentile_approx(col(keyCol).cast("long"),
      typedLit(fracs), lit(accuracy))).collect()(0)
    require(!row.isNullAt(0),
      s"boundariesFromQuantiles: no non-null '$keyCol' values to " +
        "derive boundaries from (empty or all-null input)")
    row.getSeq[Long](0).distinct.sorted
  }

  /** Shard inventory of a written directory: one row per data file with
    * its row count and key span — the manifest a training job consumes.
    * The scan is pruned to the key column only.
    */
  def shardManifest(spark: org.apache.spark.sql.SparkSession,
      outDir: String, keyCol: String): DataFrame = {
    spark.read.parquet(outDir)
      .select(input_file_name().as("shard"), col(keyCol))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).as("key_min"), max(col(keyCol)).as("key_max"))
      .orderBy(col("key_min"))
  }
}
