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
    * micro-batch per touched cell — run [[compactBatches]] (NOT
    * `Similarity.compactCells`, which lists `<partitionCol>=` dirs at
    * the root and no-ops on this tree shape) periodically from
    * OUTSIDE the stream, after the checkpoint has committed past the
    * batches being folded.
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

  /** Compaction for an [[indexByBatch]] tree — `Similarity
    * .compactCells` can NOT compact it (it lists `<partitionCol>=`
    * dirs at the ROOT, finds only `_batch=` dirs, and returns empty —
    * a silent no-op), and folding across `_batch` subtrees from inside
    * the stream would break the replay-overwrite keying. This is the
    * OUTSIDE-the-stream pass: every `_batch ≤ uptoBatch` subtree folds
    * into ONE consolidated subtree (named `_batch=<smallest folded
    * id>`, one file per `partitionCol` value), so probe-side file
    * count stops growing with stream age. Returns the folded batch
    * ids (empty when fewer than two qualify).
    *
    * REPLAY-SAFETY CONTRACT: only call with `uptoBatch` < the stream's
    * latest committed batch id — foreachBatch replays exactly the last
    * uncommitted batch, so folded batches can never be replayed; a
    * replay of a folded id would resurrect its subtree alongside the
    * consolidated rows (duplicates).
    *
    * CRASH RECOVERY: the swap is RESUMABLE, making the re-run-on-crash
    * contract real. The consolidated subtree is fully written to a
    * temp tree, then a `_graft_fold` manifest (target id + folded ids)
    * commits INSIDE it — only after that do the source `_batch=`
    * subtrees delete and the temp tree rename in. A re-run that finds
    * the manifest finishes the pending swap (delete survivors, rename)
    * instead of rewriting the temp tree — rewriting would destroy the
    * only copy of rows whose sources were already deleted. A temp tree
    * WITHOUT a manifest is an incomplete write (no source was deleted
    * yet) and is safely rewritten; `uptoBatch` is ignored while a
    * pending swap exists (the manifest pins that fold).
    */
  def compactBatches(spark: org.apache.spark.sql.SparkSession,
      out: String, partitionCol: String, uptoBatch: Long,
      fromBatch: Long = 0L): Seq[Long] =
    compactBatchesWith(spark, out, uptoBatch, (folded, tmp) =>
      folded.repartition(col(partitionCol))
        .write.partitionBy(partitionCol).mode("overwrite").parquet(tmp),
      fromBatch)

  /** [[compactBatches]] for the NON-partitioned `_batch=` trees
    * ([[parquetByBatch]] outputs — [[dedupIngestByBatch]]'s fp/tok
    * index trees and its flags tree): every `_batch ≤ uptoBatch`
    * subtree folds into ONE consolidated `_batch=<smallest folded id>`
    * subtree of exactly `numFiles` files (coalesce, no shuffle), so a
    * lookup's file LISTING stops growing with stream age — at 10⁵
    * micro-batches the un-folded trees' listing is the lookup job
    * itself. Same resumable `_graft_fold` swap, same REPLAY-SAFETY
    * CONTRACT as [[compactBatches]]: only fold `uptoBatch` < the
    * stream's latest committed batch id. The ingest's time-travel
    * filter (`_batch < id`) is unaffected — folded rows keep the
    * smallest folded id, which stays strictly below every batch id
    * that can still replay.
    */
  def compactBatchesFlat(spark: org.apache.spark.sql.SparkSession,
      out: String, uptoBatch: Long, numFiles: Int = 1,
      fromBatch: Long = 0L): Seq[Long] = {
    require(numFiles >= 1, s"numFiles must be ≥1 (got $numFiles)")
    compactBatchesWith(spark, out, uptoBatch, (folded, tmp) =>
      folded.coalesce(numFiles).write.mode("overwrite").parquet(tmp),
      fromBatch)
  }

  /** One maintenance call folding ALL THREE of a [[dedupIngestByBatch]]
    * index root's trees (band via [[compactBatches]], fp/tok via
    * [[compactBatchesFlat]]) under the shared replay-safety contract —
    * the stream owner's scheduled pass. Returns the folded batch ids
    * per tree. Each tree's fold is independently crash-resumable; a
    * re-run after a crash finishes whichever swaps were pending.
    */
  def compactIngestTrees(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, uptoBatch: Long, numFiles: Int = 1,
      fromBatch: Long = 0L)
  : Map[String, Seq[Long]] = Map(
    "fp" -> compactBatchesFlat(spark, s"$indexRoot/fp", uptoBatch, numFiles,
      fromBatch),
    "band" -> compactBatches(spark, s"$indexRoot/band", "band", uptoBatch,
      fromBatch),
    "tok" -> compactBatchesFlat(spark, s"$indexRoot/tok", uptoBatch,
      numFiles, fromBatch))

  /** IN-STREAM fold scheduling — [[compactIngestTrees]] driven from
    * inside the foreachBatch body itself, so an ingest stream keeps its
    * own listings flat without an external maintenance job: call once
    * per micro-batch (or let [[dedupIngestByBatch]]'s `foldEvery` do
    * it); every `everyN` batches it folds all three trees with
    * `uptoBatch = batchId - 2`.
    *
    * That bound is the replay-safety contract DERIVED rather than
    * guessed: inside foreachBatch(batchId) the stream's latest
    * COMMITTED batch is batchId − 1 (the engine dispatches batch B only
    * after B−1's checkpoint commit, and a replayed batch is precisely
    * the last UNcommitted one), so `committed − 1 = batchId − 2` keeps
    * one committed batch unfolded as margin and can never fold a batch
    * that could still replay.
    *
    * Crash-safe at every point in the batch body: the fold is the
    * resumable manifest swap of [[compactBatches]], and a crash
    * anywhere between the fold and the batch's checkpoint commit
    * replays the SAME batchId — the replay's foldIfDue fires again and
    * either finishes a pending swap or no-ops (fewer than two foldable
    * subtrees remain), and the replayed flags recompute identically
    * because folding preserves rows and the folded target id stays
    * strictly below every replayable batch id (the `_batch < batchId`
    * time-travel read sees the same logical state).
    */
  def foldIfDue(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, batchId: Long, everyN: Int, numFiles: Int = 1,
      tailOnly: Boolean = false): Map[String, Seq[Long]] = {
    require(everyN > 0, s"foldIfDue cadence must be positive (got $everyN)")
    // tailOnly = the LSM-lite policy: fold ONLY the fresh tail — the
    // ~everyN subtrees since the previous due point — into one run,
    // never re-reading older consolidated runs. Listings then grow as
    // batches/everyN runs (plus the fresh tail) instead of staying
    // constant, but total fold work over the stream is O(n) instead of
    // the full policy's O(n²/everyN): the full fold rewrites the WHOLE
    // accumulated tree every due point (measured: the per-fold wall
    // grows with the corpus, STREAM_1m_f10_r15), which at 10⁴+ batches
    // dominates the stream. Pick full for constant listings on short
    // streams, tail for long-lived ingests. Same replay-safety bound
    // either way (nothing ≥ batchId−1 is ever touched); the range
    // fold's target id is its smallest folded id, so the time-travel
    // filter is unaffected.
    val from = if (tailOnly) math.max(0L, batchId - everyN - 1) else 0L
    if (batchId >= 2 && batchId % everyN == 0)
      compactIngestTrees(spark, indexRoot, batchId - 2, numFiles, from)
    else Map.empty
  }

  /** The shared fold core: list `_batch=` subtrees in
    * [`fromBatch`, `uptoBatch`], write the consolidated tree to
    * `<out>_compact_tmp` via `rewrite` (which receives the folded rows
    * WITHOUT `_batch` and the temp path), commit the `_graft_fold`
    * manifest inside it, then swap — per the crash-recovery contract
    * documented on [[compactBatches]].
    *
    * `fromBatch > 0` is the RANGE fold behind the tail policy: only
    * subtrees inside the range fold (into `_batch=<smallest folded
    * id>` — still ≥ fromBatch, so ids stay time-travel-consistent:
    * every folded row's new label is ≤ its true batch id and ≥ the
    * range start, and every lookup bound that admitted the range
    * admits the label). Runs BELOW the range are never read or
    * rewritten — the property that turns a fixed fold cadence from
    * O(n²/everyN) total rewrite work into O(n).
    */
  private def compactBatchesWith(spark: org.apache.spark.sql.SparkSession,
      out: String, uptoBatch: Long,
      rewrite: (DataFrame, String) => Unit,
      fromBatch: Long = 0L): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(
      root.getParent, root.getName + "_compact_tmp")
    val manifest = new org.apache.hadoop.fs.Path(tmp, FoldManifest)
    def finishSwap(target: Long, folded: Seq[Long]): Seq[Long] = {
      folded.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"_batch=$b"), true)
      }
      val dest = new org.apache.hadoop.fs.Path(root, s"_batch=$target")
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(
          s"compactBatches: rename $tmp -> $dest failed — the folded " +
            "rows are in the temp tree, not the index; re-run to resume")
      // the manifest rode the rename into the batch dir (underscore-
      // hidden from readers); drop it now that the swap is durable
      fs.delete(new org.apache.hadoop.fs.Path(dest, FoldManifest), false)
      // the overwrite replaced listed files; invalidate cached listings
      spark.catalog.refreshByPath(out)
      folded
    }
    if (fs.exists(manifest)) {
      val (target, folded) = readFoldManifest(fs, manifest)
      return finishSwap(target, folded)
    }
    val batchIds = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_batch="))
      .map(_.getPath.getName.stripPrefix("_batch=").toLong)
      .filter(b => b >= fromBatch && b <= uptoBatch).toSeq.sorted
    if (batchIds.size < 2) return Seq.empty
    val target = batchIds.head
    rewrite(
      spark.read.parquet(out)
        .filter(col("_batch").cast("long") >= fromBatch &&
          col("_batch").cast("long") <= uptoBatch)
        .drop("_batch"),
      tmp.toString)
    writeFoldManifest(fs, manifest, target, batchIds)
    finishSwap(target, batchIds)
  }

  /** Self-growing EXACTLY-ONCE streaming dedup ingest — the text-dedup
    * analog of [[indexByBatch]]'s ANN build, closing the loop the
    * batch-side `corpusIndexesAppend` leaves open in a stream (a raw
    * append is at-least-once; a replayed batch would append its index
    * rows AGAIN and later lookups would double-count them). Each
    * micro-batch:
    *
    *  1. is flagged against the index rows of every EARLIER batch
    *     ([[graft.ops.Dedup.crossDedupFlagsFromIndexes]] over the
    *     accumulated batch-keyed (fp, band, tok) trees under
    *     `indexRoot`) — zero passes over earlier batches' text;
    *  2. writes its flags `(id, exact_dup, near_dup)` batch-keyed to
    *     `flagsOut` (the stream's product);
    *  3. appends the index rows of its KEPT (non-dup) docs under
    *     `_batch=<id>` in all three trees — so later batches dedup
    *     against everything kept so far and the corpus stays deduped
    *     as it grows.
    *
    * EXACTLY-ONCE under foreachBatch's at-least-once replay: a
    * replayed batch can find its OWN rows already in the trees, and
    * flagging a doc against itself would flip its flags (kept →
    * self-dup), rewrite a different subtree than the first run, and
    * poison every later batch. The lookup therefore reads
    * `_batch < batchId` — a PARTITION-pruned time-travel filter — so a
    * replay sees exactly the index state the first run saw, recomputes
    * byte-identical flags, and each dynamic-partition overwrite of
    * `_batch=<id>` is a no-op rewrite. The four writes are not atomic
    * as a group, but any partial state a crash leaves is healed by the
    * same property: the replay overwrites each `_batch=<id>` partition
    * from flags that depend only on `_batch < id` state
    * (crash+replay ≡ uninterrupted, spec'd in StreamingSpec).
    * Downstream consumers of `flagsOut` get the flag-sink contract of
    * every foreachBatch side output: a batch's subtree can exist
    * before its checkpoint commits (and before its index rows land) —
    * gate consumption on the stream's committed offsets, or tolerate
    * the last batch being rewritten in place.
    *
    * WITHIN-batch dups are out of contract (the corpus-lookup shape
    * flags batch vs corpus): a micro-batch carrying internal copies
    * keeps them all this round and dedups against them from the next
    * batch on; pre-collapse the batch (`exactDedupFlags` /
    * `componentDedupFlags`) when that matters.
    *
    * Compaction — all four trees this ingest grows have a resumable
    * fold: without one they accumulate one `_batch=` subtree per
    * micro-batch forever, and at 10⁵ micro-batches the `prior()`
    * lookup's file LISTING is the job (growth measured pre/post fold
    * in STREAM_*_r14). `foldEvery = N` schedules it IN-STREAM via
    * [[foldIfDue]] (fires at the top of every Nth batch's body with
    * `uptoBatch = batchId - 2`, the derived replay-safe bound — see
    * foldIfDue for the crash analysis), so a long-running ingest needs
    * no external maintenance job; the default 0 leaves folding to an
    * OUTSIDE-the-stream [[compactIngestTrees]] pass run after the
    * checkpoint commits past the folded ids (the band tree is
    * [[compactBatches]]-shaped, partitionCol "band"; the fp/tok trees
    * — and the flags tree, if its consumers want it — fold with
    * [[compactBatchesFlat]]). Either way the folded target id is the
    * smallest folded id, strictly below any batch that can still
    * replay, so the `_batch < id` time-travel contract is preserved
    * across folds.
    */
  def dedupIngestByBatch(indexRoot: String, flagsOut: String,
      textCol: String, idCol: String, numHashes: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.3, foldEvery: Int = 0,
      foldTail: Boolean = false)(
      df: DataFrame, batchId: Long): Unit = {
    import graft.ops.Dedup
    val spark = df.sparkSession
    // fold FIRST so the current batch's prior() lookup already reads
    // the consolidated listings — the fold only touches _batch ≤
    // batchId-2, which the lookup sees identically either way.
    // foldTail picks the O(n)-total-work tail policy over the
    // constant-listing full policy (trade documented on foldIfDue)
    if (foldEvery > 0)
      foldIfDue(spark, indexRoot, batchId, foldEvery,
        tailOnly = foldTail): Unit
    val (fpDir, bandDir, tokDir) =
      (s"$indexRoot/fp", s"$indexRoot/band", s"$indexRoot/tok")
    // shape frames for the first-batch case (no tree yet): the batch's
    // own triple, emptied — same schema the accumulated trees carry
    val (fpShape, bandShape, tokShape) = Dedup.corpusIndexesFromProfile(
      Dedup.corpusProfile(df, textCol, idCol), numHashes, bands)
    def prior(dir: String, shape: DataFrame): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      // hasBatchDataBelow, not hasDataFiles/fs.exists: bare existence is
      // the empty-first-batch wedge (an EMPTY micro-batch leaves only
      // _SUCCESS and reading it throws "Unable to infer schema" — r16
      // ADVICE), and a tree whose data all sits at `_batch ≥ batchId`
      // (a replayed earliest batch) partition-prunes the time-travel
      // read to statically empty anyway — the empty-shape frame is the
      // same prior state with no scan to plan (r19)
      if (graft.io.FsUtil.hasBatchDataBelow(fs, p, batchId))
        spark.read.parquet(dir)
          .filter(col("_batch").cast("long") < batchId).drop("_batch")
      else shape.filter(lit(false))
    }
    // EAGER batch-sized checkpoints: the flags probe and the kept-rows
    // profile each materialize ONCE, then the four writes they feed
    // (flags + fp/band/tok — disjoint trees, no ordering contract
    // between them; replay rewrites each byte-identically) overlap from
    // the driver pool (guide §2.6). Lazy checkpoints here would race
    // the overlapped writes into re-computing the shared frame.
    val flags = Dedup.crossDedupFlagsFromIndexes(df, textCol, idCol,
      prior(fpDir, fpShape), prior(bandDir, bandShape),
      prior(tokDir, tokShape), numHashes, bands, minJaccard)
      .localCheckpoint()
    val kept = df.join(
      flags.filter(!col("exact_dup") && !col("near_dup")).select(idCol),
      Seq(idCol))
    // ONE text pass (fingerprint + shingles) feeds all three index
    // writes — the corpusIndexesAppend convention; without it each
    // write re-runs the join + profile
    val keptProf = Dedup.corpusProfile(kept, textCol, idCol)
      .localCheckpoint()
    val (fpK, bandK, tokK) = Dedup.corpusIndexesFromProfile(
      keptProf, numHashes, bands)
    graft.io.ParallelActions.run(Seq(
      () => parquetByBatch(flagsOut)(flags, batchId),
      () => parquetByBatch(fpDir)(fpK, batchId),
      () => indexByBatch(bandDir, "band")(bandK, batchId),
      () => parquetByBatch(tokDir)(tokK, batchId)))
  }

  /** The EMBEDDING-family twin of [[dedupIngestByBatch]]: a
    * self-growing exactly-once streaming SEMANTIC dedup ingest. Each
    * micro-batch of (id, vector) rows is flagged against the vectors
    * every EARLIER batch kept (keep iff best cosine under the IVF
    * probe < `tau` — [[graft.ops.Similarity.semanticDedupFlags]]'s
    * contract, nProbe cells probed per query), then appends only its
    * KEPT rows' (id, vec, cell) index rows under `_batch=<id>/cell=<c>`
    * — the same batch-keyed dynamic-partition-overwrite tree the band
    * index uses, so the `_batch < id` time-travel read gives a replayed
    * batch exactly the state its first run saw (self-matches are
    * impossible; replays rewrite byte-identically) and the probe prunes
    * at BOTH levels (batch subtrees by the time-travel bound, cells by
    * the static probe predicate).
    *
    * The codebook is the stream's INVARIANT: cell assignments must come
    * from one codebook across every batch or the probe mis-routes, so
    * the first batch stamps the tree with a codebook-identity sidecar
    * ([[graft.ops.Similarity.writeStampSidecar]] — the same O(1)
    * mechanism the persisted IVF index uses) and every later batch
    * REFUSES a drifted codebook before writing anything. Re-clustering
    * mid-stream therefore requires a new index root (by design — the
    * accumulated cell layout is meaningless under new centroids).
    *
    * WITHIN-batch dups are out of contract, as in the text ingest: the
    * corpus-lookup shape flags batch vs corpus. `excludeSelf` defaults
    * false here (a streaming ingest's ids are new by construction);
    * pass true for the corpus-refresh case where a re-embedded id must
    * not match its own old row.
    *
    * `foldEvery = N` folds the vec tree in-stream every Nth batch with
    * `uptoBatch = batchId - 2` — the same derived replay-safety bound,
    * crash analysis, and full-vs-tail policy trade as [[foldIfDue]]
    * (the fold here is ONE [[compactBatches]] call, partitionCol
    * "cell"); the flags tree is the caller's to fold
    * ([[compactBatchesFlat]]) if its consumers want it.
    */
  def semanticIngestByBatch(indexRoot: String, flagsOut: String,
      idCol: String, vecCol: String, centroids: DataFrame,
      centroidIdCol: String, centroidVecCol: String, tau: Double,
      nProbe: Int = 2, excludeSelf: Boolean = false, foldEvery: Int = 0,
      foldTail: Boolean = false)(df: DataFrame, batchId: Long): Unit =
    semanticIngestByBatchFrom(indexRoot, flagsOut, idCol, vecCol,
      graft.ops.Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), tau, nProbe, excludeSelf, foldEvery, foldTail)(
      df, batchId)

  /** [[semanticIngestByBatch]] over a PRE-COLLECTED codebook — a
    * multi-batch caller (the two-epoch gate queries; any driver loop
    * feeding batches by hand) collects the centroid frame ONCE instead
    * of paying one collect job per batch (r19, the same threading as
    * the probe-layer `*From` variants from r18). The stream invariant
    * is unchanged: the stamp is computed from `cents` and checked
    * against the tree's sidecar before any mutation.
    */
  private[graft] def semanticIngestByBatchFrom(indexRoot: String,
      flagsOut: String, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double])], tau: Double,
      nProbe: Int = 2, excludeSelf: Boolean = false, foldEvery: Int = 0,
      foldTail: Boolean = false)(df: DataFrame, batchId: Long): Unit = {
    import graft.ops.Similarity
    val spark = df.sparkSession
    val vecDir = s"$indexRoot/vec"
    // drift check BEFORE the fold: the fold rewrites/deletes _batch
    // subtrees, and the documented contract is that a drifted codebook
    // is refused before ANY tree mutation — a fold-due batch with a
    // drifted codebook must not compact the tree it is about to refuse
    // to write into (r16 ADVICE)
    val stamp = Similarity.codebookStamp(cents)
    val sidecar = Similarity.readStampSidecar(spark, vecDir)
    sidecar.foreach { s =>
      if (s != stamp)
        throw new IllegalStateException(
          "semanticIngestByBatch: this call's codebook (stamp " +
            s"$stamp) is not the one the index tree at $vecDir was " +
            s"built under ($s) — the accumulated cell assignments " +
            "would mis-route the probe. Re-clustering requires a new " +
            "index root.")
    }
    if (foldEvery > 0 && batchId >= 2 && batchId % foldEvery == 0) {
      val from =
        if (foldTail) math.max(0L, batchId - foldEvery - 1) else 0L
      compactBatches(spark, vecDir, "cell", batchId - 2,
        fromBatch = from): Unit
    }
    val p = new org.apache.hadoop.fs.Path(vecDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // hasBatchDataBelow, not hasDataFiles/fs.exists: the FS-metadata
    // form of the `_batch < batchId` partition pruning — a replayed
    // earliest batch takes the all-keep fast path instead of planning
    // a probe over a statically-empty prior (see the PQ ingest)
    val flags = (if (graft.io.FsUtil.hasBatchDataBelow(fs, p, batchId)) {
      val prior = spark.read.parquet(vecDir)
        .filter(col("_batch").cast("long") < batchId).drop("_batch")
      // cents — collected once above for the stamp — threads through
      // the probe instead of a second centroid collect (r18)
      Similarity.semanticDedupFlagsFrom(df, idCol, vecCol, prior, idCol,
        vecCol, cents, tau, nProbe, excludeSelf)
    } else
      // first batch: no prior tree — everything keeps, no search job
      // (and no empty-frame stamp ambiguity to warn about)
      df.select(col(idCol),
        lit(null).cast(df.schema(idCol).dataType).as("neighbor_id"),
        lit(null).cast("double").as("cos_sim"), lit(true).as("keep")))
      // EAGER batch-sized checkpoint: the probe materializes once, then
      // the flags write and the kept-index write — disjoint trees, no
      // ordering contract, each replay-idempotent — overlap from the
      // driver pool (guide §2.6); a lazy checkpoint would race the two
      // overlapped consumers into re-computing the probe
      .localCheckpoint()
    val kept = df.join(flags.filter(col("keep")).select(idCol), Seq(idCol))
    // repartition by cell before the write: one file per TOUCHED cell
    // per batch instead of one per (cell × input partition) — at 32
    // cores the un-repartitioned tree lists ~32× more files for the
    // same rows, and the probe's per-cell listing is exactly what the
    // fold exists to protect. The shuffle is batch-sized (the bounded
    // quantity).
    val keptAssigned = Similarity.ivfAssignLocal(
      kept.select(col(idCol), col(vecCol)), vecCol, cents)
      .select(col(idCol), col(vecCol), col("cell"))
      .repartition(col("cell"))
    graft.io.ParallelActions.run(Seq(
      () => parquetByBatch(flagsOut)(flags, batchId),
      () => indexByBatch(vecDir, "cell")(keptAssigned, batchId)))
    // stamp AFTER the first write so the sidecar never outlives a
    // crashed pre-write batch; a replay re-stamps identically
    if (sidecar.isEmpty)
      Similarity.writeStampSidecar(spark, vecDir, stamp)
  }

  /** The NO-FULL-VECTOR regime of [[semanticIngestByBatch]] — the
    * streaming twin of [[graft.ops.Pq.semanticDedupFlagsPq]], closing
    * the 100 TB streaming gap the plain ingest leaves open: its vec
    * tree stores the FULL vector per kept row (~0.5 TB at 10⁹ 64-dim
    * vectors — the payload the IVF-PQ index exists to avoid), and its
    * in-stream folds REWRITE that payload every due point. Here each
    * micro-batch is flagged by ADC top-1 against the earlier batches'
    * accumulated (id, pq_code, cell) tree — the probe reads m bytes
    * per candidate, never a vector — and appends only its KEPT rows'
    * codes, so the tree the stream grows (and the folds rewrite) is
    * ~(8·dim)/m× smaller than the plain ingest's (64× at dim=64, m=8;
    * measured in SEMINGEST_PQ_1m_r16).
    *
    * Same exactly-once protocol as the plain ingest, point for point:
    * `_batch=<id>/cell=<c>` dynamic-partition-overwrite keying, the
    * `_batch < id` time-travel prior read (a replayed batch can never
    * self-match; replays rewrite byte-identically), `batchId − 2` as
    * the derived replay-safe fold bound, and the same full-vs-tail
    * fold policy trade ([[foldIfDue]]). The stream invariant widens to
    * BOTH codebooks: the sidecar carries the combined IVF+PQ stamp
    * ([[graft.ops.Pq.combinedStamp]]), and a drift in EITHER refuses
    * before any tree mutation — a drifted IVF codebook mis-routes the
    * probe, a drifted PQ codebook mis-SCORES it (silently, which is
    * worse). Re-clustering or re-training requires a new index root;
    * [[graft.ops.Similarity.rebuildUnderCodebook]]-family migration
    * ops are the managed path out.
    *
    * Flag semantics are [[graft.ops.Pq.semanticDedupFlagsPq]]'s:
    * `keep = no indexed neighbor within tauDist` (probed-cell misses
    * surface as NULL neighbors ⇒ keep). The trade vs the plain ingest
    * is quantization error in the SCORE — a true near-dup straddling
    * tauDist by less than the probe error can flip (the recall/τ study
    * in SEMDEDUP artifacts); the protocol (time-travel, kept-only
    * indexing, replay surface) is identical and spec'd in
    * StreamingSpec. Flags are (id, neighbor_id, <score>, keep),
    * batch-keyed under `flagsOut`.
    *
    * `probeMode` picks the probe kernel — the score column name and
    * the τ recipe follow it:
    *  - "adc" (default): per-query m·k-double LUTs, score `adc_dist`.
    *    The LUT is 32× a dim-64 vector, so at LARGE batch sizes the
    *    per-batch broadcast+hash-probe cost dominates the ingest wall
    *    (measured 1.9× the plain ingest's at 20k-row batches,
    *    SEMINGEST_PQ_1m_f10_r16).
    *  - "sdc": the batch ships m-byte query CODES against the ONE
    *    shared m·k² table ([[graft.ops.Pq.semanticDedupFlagsPqSdc]]),
    *    score `sdc_dist` — the large-batch regime this ingest's shape
    *    is (a micro-batch IS a large query batch); chunking past the
    *    broadcast ceiling is automatic. The price is the second
    *    quantization on the query side — measured ~13% of planted
    *    near-dups missed at the random-unit worst case vs ADC's ~1.5%
    *    (SEMINGEST_PQ_SDC_1m_f10_r17).
    *  - "hybrid": SDC for the whole batch, ADC re-scoring for ONLY the
    *    straddlers — the queries whose best symmetric distance lands
    *    within `band` of `tauDist` ([[graft.ops.Pq
    *    .semanticDedupFlagsPqHybrid]]) — closing the SDC recall notch
    *    at band-sized ADC cost (99.98% ADC-verdict agreement at 1/6
    *    its wall, HYBRID_1m_r17.json). Score column stays `sdc_dist`
    *    (the cheap pass's attribution); `tauDist` is the SDC
    *    threshold and `tauAdc`/`band`/`refineK` (hybrid-only
    *    parameters, refused in other modes) shape the refinement.
    * Either way `tauDist` must be calibrated FOR THE MODE —
    * [[graft.ops.Pq.calibrateTauDist]] with the matching `mode` is the
    * executable recipe (boundary-pair measurement; SDC straddler pairs
    * share codes, so its τ is NOT simply the ADC τ plus a bias).
    * Hybrid calibrates BOTH: `tauDist` in mode "sdc", `tauAdc` in
    * mode "adc". The modes flag-agree wherever quantization doesn't
    * straddle (flag parity on a lossless codebook is spec'd). The
    * CODE tree is mode-independent (codes under the combined stamp —
    * a mid-stream switch probes the same tree correctly), but the
    * FLAGS tree's score column follows the mode: batches written
    * across an adc↔(sdc|hybrid) switch carry different score columns,
    * so flags consumers spanning one need `mergeSchema` (or project
    * (id, keep) only).
    *
    * Downstream of this tree: probes/dedup read codes only; when exact
    * re-rank is wanted, fetch candidates' vectors BY ID from the
    * stream's source table (candidate-sized join) — the ingest
    * deliberately does not persist a vector twin, that regime is the
    * plain [[semanticIngestByBatch]].
    */
  def semanticIngestPqByBatch(indexRoot: String, flagsOut: String,
      idCol: String, vecCol: String, centroids: DataFrame,
      centroidIdCol: String, centroidVecCol: String,
      cb: graft.ops.Pq.Codebook, tauDist: Double, nProbe: Int = 2,
      excludeSelf: Boolean = false, foldEvery: Int = 0,
      foldTail: Boolean = false, probeMode: String = "adc",
      tauAdc: Double = Double.NaN, band: Double = Double.NaN,
      refineK: Int = 4)(
      df: DataFrame, batchId: Long): Unit =
    semanticIngestPqByBatchFrom(indexRoot, flagsOut, idCol, vecCol,
      graft.ops.Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, tauDist, nProbe, excludeSelf, foldEvery,
      foldTail, probeMode, tauAdc, band, refineK)(df, batchId)

  /** [[semanticIngestPqByBatch]] over a PRE-COLLECTED codebook — one
    * centroid collect per multi-batch driver instead of one per batch
    * (r19); see [[semanticIngestByBatchFrom]].
    */
  private[graft] def semanticIngestPqByBatchFrom(indexRoot: String,
      flagsOut: String, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double])],
      cb: graft.ops.Pq.Codebook, tauDist: Double, nProbe: Int = 2,
      excludeSelf: Boolean = false, foldEvery: Int = 0,
      foldTail: Boolean = false, probeMode: String = "adc",
      tauAdc: Double = Double.NaN, band: Double = Double.NaN,
      refineK: Int = 4)(
      df: DataFrame, batchId: Long): Unit = {
    require(probeMode == "adc" || probeMode == "sdc" ||
      probeMode == "hybrid",
      "semanticIngestPqByBatch: probeMode must be \"adc\", \"sdc\" or " +
        s""""hybrid" (got "$probeMode")""")
    if (probeMode == "hybrid")
      require(!tauAdc.isNaN && !band.isNaN,
        "semanticIngestPqByBatch: probeMode=hybrid needs tauAdc AND " +
          "band (tauDist is the SDC threshold; calibrate tauAdc with " +
          "Pq.calibrateTauDist mode=\"adc\", band ≈ the boundary " +
          "spread — 0 degenerates to pure sdc)")
    else
      require(tauAdc.isNaN && band.isNaN,
        s"semanticIngestPqByBatch: tauAdc/band are hybrid-only " +
          s"parameters (probeMode=$probeMode) — a silently-ignored " +
          "threshold is a mis-calibration waiting to happen")
    import graft.ops.{Pq, Similarity}
    val spark = df.sparkSession
    val codeDir = s"$indexRoot/code"
    // drift (either codebook) refused BEFORE any tree mutation,
    // including a due fold — same ordering contract as the plain ingest
    val stamp = Pq.combinedStamp(Similarity.codebookStamp(cents), cb)
    val sidecar = Similarity.readStampSidecar(spark, codeDir)
    sidecar.foreach { s =>
      if (s != stamp)
        throw new IllegalStateException(
          "semanticIngestPqByBatch: this call's codebooks (combined " +
            s"stamp $stamp) are not the ones the code tree at $codeDir " +
            s"was built under ($s) — a drifted IVF codebook mis-routes " +
            "the probe, a drifted PQ codebook mis-scores it. " +
            "Re-clustering/re-training requires a new index root.")
    }
    if (foldEvery > 0 && batchId >= 2 && batchId % foldEvery == 0) {
      val from =
        if (foldTail) math.max(0L, batchId - foldEvery - 1) else 0L
      compactBatches(spark, codeDir, "cell", batchId - 2,
        fromBatch = from): Unit
    }
    val p = new org.apache.hadoop.fs.Path(codeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // hasBatchDataBelow, not hasDataFiles/fs.exists: (a) bare existence
    // is the empty-first-batch wedge (see dedupIngestByBatch's prior());
    // (b) a tree whose only data sits at `_batch ≥ batchId` — every
    // REPLAY of the earliest data-carrying batch — partition-prunes the
    // `_batch < batchId` prior read to statically empty, so the probe
    // is a no-op that still costs ~15 empty-stage Spark jobs per
    // invocation (JobProf r19). The FS-metadata check IS that partition
    // pruning, at zero jobs; the fast path below produces the identical
    // all-keep flags the empty-prior probe would.
    val scoreCol = if (probeMode == "adc") "adc_dist" else "sdc_dist"
    val flags = (if (graft.io.FsUtil.hasBatchDataBelow(fs, p, batchId)) {
      val prior = spark.read.parquet(codeDir)
        .filter(col("_batch").cast("long") < batchId).drop("_batch")
      // the *From variants thread `cents` — collected once above for
      // the stamp check — through the probe instead of re-collecting
      // the centroid frame per layer/chunk (r18)
      probeMode match {
        case "sdc" =>
          Pq.semanticDedupFlagsPqSdcFrom(df, idCol, vecCol, prior,
            idCol, cents, cb, tauDist, nProbe, excludeSelf)
        case "hybrid" =>
          Pq.semanticDedupFlagsPqHybridFrom(df, idCol, vecCol, prior,
            idCol, cents, cb,
            tauSdc = tauDist, tauAdc = tauAdc, band = band,
            refineK = refineK, nProbe = nProbe,
            excludeSelf = excludeSelf)
        case _ =>
          Pq.semanticDedupFlagsPqFrom(df, idCol, vecCol, prior, idCol,
            cents, cb, tauDist, nProbe, excludeSelf)
      }
    } else
      // first batch with data: no prior — everything keeps, no search
      df.select(col(idCol),
        lit(null).cast(df.schema(idCol).dataType).as("neighbor_id"),
        lit(null).cast("double").as(scoreCol), lit(true).as("keep")))
      // EAGER batch-sized checkpoint, then the two disjoint-tree writes
      // overlap — same §2.6 shape and crash analysis as the plain
      // ingest's
      .localCheckpoint()
    val kept = df.join(flags.filter(col("keep")).select(idCol), Seq(idCol))
    // assign + encode in one batch-sized scan; repartition by cell for
    // one file per TOUCHED cell per batch (same listing math as the
    // plain ingest — the shuffle is batch-sized)
    val keptCodes = Pq.encode(
      Similarity.ivfAssignLocal(kept.select(col(idCol), col(vecCol)),
        vecCol, cents), vecCol, cb)
      .select(col(idCol), col("pq_code"), col("cell"))
      .repartition(col("cell"))
    graft.io.ParallelActions.run(Seq(
      () => parquetByBatch(flagsOut)(flags, batchId),
      () => indexByBatch(codeDir, "cell")(keptCodes, batchId)))
    // stamp AFTER the first write so the sidecar never outlives a
    // crashed pre-write batch; a replay re-stamps identically
    if (sidecar.isEmpty)
      Similarity.writeStampSidecar(spark, codeDir, stamp)
  }

  /** The resumable-swap commit record: its presence inside a temp tree
    * means the consolidated rows are COMPLETE and the source-dir
    * deletes may have begun — a re-run must finish the swap, never
    * rewrite the tree. Shared by [[compactBatches]] (payload: target
    * batch id + folded batch ids) and
    * [[graft.ops.Similarity.compactCells]] (payload: the compacted
    * cell ids), each crash-injection-spec'd in StreamingSpec.
    */
  private[graft] val FoldManifest = "_graft_fold"

  private[graft] def writeFoldManifest(fs: org.apache.hadoop.fs.FileSystem,
      manifest: org.apache.hadoop.fs.Path, target: Long,
      folded: Seq[Long]): Unit = {
    val outS = fs.create(manifest, true)
    try outS.write(s"$target\n${folded.mkString(",")}\n".getBytes("UTF-8"))
    finally outS.close()
  }

  private[graft] def readFoldManifest(fs: org.apache.hadoop.fs.FileSystem,
      manifest: org.apache.hadoop.fs.Path): (Long, Seq[Long]) = {
    val lines = graft.io.FsUtil.readFullyUtf8(fs, manifest)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"fold manifest $manifest vanished mid-read"))
      .split("\n")
    (lines(0).toLong, lines(1).split(",").map(_.toLong).toSeq)
  }
}
