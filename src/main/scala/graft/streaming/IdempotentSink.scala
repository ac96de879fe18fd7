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
}
