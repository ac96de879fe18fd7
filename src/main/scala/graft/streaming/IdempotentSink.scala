package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent `foreachBatch` sink: exactly-once for targets WITHOUT a
  * commit log (plain directory trees, JDBC-style upserts), complementing
  * the file sink's built-in log (StreamingSpec's checkpoint-recovery
  * cases).
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: on
  * recovery the last uncommitted micro-batch REPLAYS with the same
  * `batchId`. Keying the write by that id and overwriting only the
  * touched partitions (dynamic partition overwrite) makes the replay a
  * byte-identical no-op instead of a duplicate append — the standard
  * production recipe for exactly-once side outputs.
  *
  * Scale shape: one directory per micro-batch; the overwrite touches
  * only `_batch=<id>`, never the accumulated history, so recovery cost
  * is one micro-batch regardless of stream age.
  */
object IdempotentSink {

  /** A `foreachBatch`-shaped function writing each micro-batch to
    * `out/_batch=<batchId>/` via dynamic partition overwrite. Replaying
    * a batch id rewrites that partition with the same rows — idempotent
    * by construction (spec'd in StreamingSpec).
    */
  def parquetByBatch(out: String)(df: DataFrame, batchId: Long): Unit = {
    require(!df.columns.contains("_batch"),
      "the micro-batch already carries a _batch column; it would be " +
        "silently replaced by the sink's batch id")
    // per-WRITE option, not the session conf: mutating the session-wide
    // partitionOverwriteMode races with concurrent writers on a shared
    // SparkSession (the option takes precedence and needs no restore)
    df.withColumn("_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch").parquet(out)
  }

  /** [[parquetByBatch]] for cell-/band-partitioned INDEX layouts — the
    * exactly-once STREAMING BUILD path for the persisted index
    * families (IVF / IVF-PQ / band): a raw `mode("append")` ingest
    * (the batch-side `ivfIndexAppend` etc.) is at-least-once under
    * foreachBatch replay — a recovered micro-batch would append its
    * rows AGAIN, and duplicated index rows occupy top-k ranks and
    * corrupt probe results. Keying the tree as
    * `_batch=<id>/<partitionCol>=<v>/` makes the replay overwrite only
    * its own `_batch` subtree (dynamic partition overwrite — byte-
    * identical no-op), while lookups keep their partition pruning on
    * `partitionCol` unchanged: Spark applies partition filters at any
    * level of the tree, so a probe reads matching cell/band dirs
    * across every batch. Fragmentation grows one file set per
    * micro-batch per touched cell — run [[graft.ops.Similarity
    * .compactCells]] periodically from OUTSIDE the stream (after its
    * checkpoint has committed past the compacted batches).
    */
  def indexByBatch(out: String, partitionCol: String)(
      df: DataFrame, batchId: Long): Unit = {
    require(!df.columns.contains("_batch"),
      "the micro-batch already carries a _batch column; it would be " +
        "silently replaced by the sink's batch id")
    df.withColumn("_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch", partitionCol).parquet(out)
  }
}
