package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Similarity

/** Embedding similarity-search surface over the `embeddings` table
  * (`ARRAY<FLOAT>` of length 64): brute-force cosine top-k baseline and
  * the sign-LSH bucketed scale path, plus vector norms.
  *
  * Oracles compute the same dot products in DuckDB via
  * unnest+generate_subscripts (both engines cast float→double before
  * multiplying; results rounded to 5 decimals to absorb summation-order
  * ulps).
  */
object Vector {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // L2 norms — the cheapest whole-corpus vector scan.
    "q55_embedding_norms" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          round(Similarity.l2Norm(col("embedding").cast("array<double>")), 5)
            .as("l2_norm"))
        .orderBy("vec_id")
    }),

    // Brute-force cosine top-10 neighbors of vec_id 0.
    "q56_knn_cosine" -> ((s, d) => {
      Similarity.knnCosine(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10)
    }),

    // Sign-LSH bucket histogram (the IVF-style partition layout).
    "q57_lsh_buckets" -> ((s, d) => {
      Similarity.lshBuckets(Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy("bucket")
    }),

    // ANN restricted to the query vector's bucket.
    "q58_lsh_ann" -> ((s, d) => {
      Similarity.lshAnn(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 5)
    }),

    // IVF cell assignment: nearest of 8 fixed centroids (vec_id < 8),
    // then per-cell occupancy — the inverted-file partition layout.
    "q59_ivf_cells" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfAssign(emb, "vec_id", "embedding",
        centroids, "cid", "cvec")
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_id"),
          round(avg(col("cell_dist2")), 4).as("avg_dist2"))
        .orderBy("cell")
    }),

    // q59 through the two-level (coarse-quantizer) assignment: the 8
    // fixture centroids cluster into 2 super-groups driver-side and
    // each vector runs the full hierarchy — two-minima super fold,
    // member-map lookup, fold over the probed groups' members. With
    // BOTH groups probed the subset is the whole codebook, so the
    // result is exact by construction and q59's flat-assignment oracle
    // applies VERBATIM — the hash match pins the two-level expression
    // machinery (not the routing heuristic, whose measured
    // agreement/cost trade on a real corpus is ASSIGN_200k_r11.json).
    "q122_ivf_hier_cells" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfAssignHierarchical(emb, "vec_id", "embedding",
        centroids, "cid", "cvec", superCells = 2, superProbe = 2)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_id"),
          round(avg(col("cell_dist2")), 4).as("avg_dist2"))
        .orderBy("cell")
    }),

    // IVF probe search: top-5 cosine neighbors of vec_id 0 scanning only
    // the query's 2 nearest cells.
    "q88_ivf_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.ivfSearch(emb, "vec_id", "embedding",
        centroids, "cid", "cvec", queryId = 0L, k = 5, nProbe = 2)
    }),

    // q88's amortized production path: the assigned corpus persists ONCE
    // as a cell-partitioned parquet index (codebook stamp included), and
    // the probe runs against the RELOADED layout — zero assignment
    // recomputation, scan pruned to the 2 probed cell directories.
    // Shares q88's oracle verbatim: same codebook, query, k, nProbe.
    "q114_ivf_indexed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val out = QueryTmp.dir("q114", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      Similarity.ivfIndexWriteFrom(emb, "embedding", cents, s"$out/ivf")
      val qVec = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>"))
        .collect()(0).getSeq[Double](0)
      Similarity.ivfSearchIndexedFrom(s.read.parquet(s"$out/ivf"),
        "vec_id", "embedding", cents,
        qVec, k = 5, nProbe = 2, excludeId = Some(0L))
    }),

    // Managed codebook MIGRATION under the gate: build the index under
    // a DIFFERENT (wider) codebook, rebuildUnderCodebook it to q114's
    // 8-centroid codebook, and run q114's exact probe against the
    // MIGRATED root. Shares q114's oracle verbatim: migration must be
    // equivalent to a fresh build under the target codebook — the old
    // layout's cells are irrelevant after re-assignment.
    "q139_ivf_migrated" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val oldCentroids = emb.filter(col("vec_id") >= 8 && col("vec_id") < 12)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val out = QueryTmp.dir("q139", s, d)
      Similarity.ivfIndexWrite(emb, "vec_id", "embedding",
        oldCentroids, "cid", "cvec", s"$out/old")
      Similarity.rebuildUnderCodebook(s, s"$out/old", s"$out/new",
        "vec_id", "embedding", centroids, "cid", "cvec")
      val qVec = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>"))
        .collect()(0).getSeq[Double](0)
      Similarity.ivfSearchIndexedFrom(s.read.parquet(s"$out/new"),
        "vec_id", "embedding",
        Similarity.collectCodebook(centroids, "cid", "cvec"),
        qVec, k = 5, nProbe = 2, excludeId = Some(0L))
    }),

    // Batch ANN: both query vectors probed against the persisted index
    // in ONE job — static probe-cell pruning + broadcast cell join,
    // exact cosine, top-5 per query. The whole-batch production form of
    // q114's single probe.
    "q115_ivf_batch_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val out = QueryTmp.dir("q115", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      Similarity.ivfIndexWriteFrom(emb, "embedding", cents, s"$out/ivf")
      Similarity.ivfSearchBatchFrom(
        emb.filter(col("vec_id") < 2), "vec_id", "embedding",
        s.read.parquet(s"$out/ivf"), "vec_id", "embedding",
        cents, k = 5, nProbe = 2)
        .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
    }),

    // q115's batch ANN with HIERARCHICAL probe-cell selection: the 8
    // fixture centroids cluster into 2 super-groups driver-side and
    // each query's probe cells come from the two-minima coarse fold +
    // bounded top-nProbe over the probed groups' members. With BOTH
    // groups probed the member subset is the whole codebook, so the
    // result is exact by construction and q115's oracle applies
    // VERBATIM — the hash pins the two-level probe machinery (the
    // routing heuristic's cost/agreement trade at real codebook sizes
    // is PROBE_*_r17's measurement, like q122 vs ASSIGN_200k_r11).
    "q142_ivf_batch_hier" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val out = QueryTmp.dir("q142", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      Similarity.ivfIndexWriteFrom(emb, "embedding", cents, s"$out/ivf")
      Similarity.ivfSearchBatchHierFrom(
        emb.filter(col("vec_id") < 2), "vec_id", "embedding",
        s.read.parquet(s"$out/ivf"), "vec_id", "embedding",
        cents, k = 5, nProbe = 2,
        superCells = 2, superProbe = 2)
        .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
    }),

    // Incremental index build: 90% of vectors build the persisted IVF
    // layout, the remaining 10% APPEND to it (assignment under the
    // stamped codebook, no rewrite of existing cells), and the q88
    // probe runs against the combined layout. Shares q88/q114's oracle
    // verbatim — the proof that an append-built index answers exactly
    // like a single-shot build over the full corpus.
    "q121_ivf_append" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isNew = col("vec_id") % 10 === 9
      val out = QueryTmp.dir("q121", s, d)
      // one codebook collect threads through build, append AND probe
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      Similarity.ivfIndexWriteFrom(emb.filter(!isNew), "embedding",
        cents, s"$out/ivf")
      Similarity.ivfIndexAppendFrom(emb.filter(isNew), "vec_id",
        "embedding", s"$out/ivf", cents)
      val qVec = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>"))
        .collect()(0).getSeq[Double](0)
      Similarity.ivfSearchIndexedFrom(s.read.parquet(s"$out/ivf"),
        "vec_id", "embedding", cents,
        qVec, k = 5, nProbe = 2, excludeId = Some(0L))
    }),

    // SemDeDup-style embedding-cosine dedup: a deterministic 10% batch
    // (vec_id % 10 = 9) probed against the persisted IVF index of the
    // other 90% — each batch vector keeps iff its best probed-cell
    // corpus neighbor's cosine < 0.4 (the fixture's cosines top out
    // ~0.5, so 0.4 exercises BOTH flag branches on gate data). The
    // embedding member of the dedup family, in the q104
    // batch-vs-corpus shape: index scanned (cell-pruned), never
    // shuffled; batch broadcast.
    "q120_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isBatch = col("vec_id") % 10 === 9
      val out = QueryTmp.dir("q120", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      Similarity.ivfIndexWriteFrom(emb.filter(!isBatch), "embedding",
        cents, s"$out/ivf")
      Similarity.semanticDedupFlagsFrom(
        emb.filter(isBatch), "vec_id", "embedding",
        s.read.parquet(s"$out/ivf"), "vec_id", "embedding",
        cents, tau = 0.4, nProbe = 2)
        .orderBy("vec_id")
    }),

    // Product-quantization code assignment under a DATA-DERIVED
    // codebook (the sub-vectors of vec_id < 4, m=2 subspaces × k=4
    // sub-centroids — the same fixture-as-codebook trick q59 uses, so
    // the oracle can re-derive the codebook in SQL): per-vector codes
    // rolled up to code-pair occupancy. The corpus-scale point is the
    // encode pass itself: one native-kernel scan, zero shuffle, m
    // bytes of code replacing the 512-byte embedding payload.
    "q124_pq_codes" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebook(emb)
      graft.ops.Pq.encode(emb, "embedding", cb)
        .select(col("vec_id"),
          element_at(col("pq_code"), 1).cast("long").as("code0"),
          element_at(col("pq_code"), 2).cast("long").as("code1"))
        .groupBy(col("code0"), col("code1"))
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_id"))
        .orderBy("code0", "code1")
    }),

    // Brute-force ADC batch search: both query vectors (vec_id < 2)
    // against every corpus code — per-query LUT computed once (native
    // kernel), candidates cost m table lookups each. The whole-corpus
    // rescore baseline for the IVF-PQ probe below.
    "q125_pq_adc_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebook(emb)
      val codes = graft.ops.Pq.encode(emb, "embedding", cb)
        .select(col("vec_id"), col("pq_code"))
      graft.ops.Pq.searchBatch(emb.filter(col("vec_id") < 2), "vec_id",
        "embedding", codes, "vec_id", cb, k = 5)
        .orderBy(col("qid"), col("adc_dist"), col("vec_id"))
    }),

    // IVF-PQ: the persisted cell-partitioned index stores (id, code) —
    // NOT the vector — and the batch probe prunes to each query's 2
    // nearest cells before ADC-scoring the survivors. The memory tier
    // (64× smaller probe scan) on top of q115's pruning tier.
    "q126_ivfpq_search" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebook(emb)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val out = QueryTmp.dir("q126", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      graft.ops.Pq.ivfPqIndexWriteFrom(emb, "vec_id", "embedding",
        cents, cb, s"$out/ivfpq")
      graft.ops.Pq.ivfPqSearchBatchFrom(
        emb.filter(col("vec_id") < 2), "vec_id", "embedding",
        s.read.parquet(s"$out/ivfpq"), "vec_id",
        cents, cb, k = 5, nProbe = 2)
        .orderBy(col("qid"), col("adc_dist"), col("vec_id"))
    }),

    // IVF-PQ with the exact re-rank tail (the production search shape):
    // top-20 ADC candidates per query, then ONLY those rows' full
    // vectors fetched from the cell-partitioned refine companion the
    // pair build emits — the fetch scan prunes to the candidates'
    // cells' directories (numFiles-gated), never reading the rest of
    // the corpus's vector payload — exact cosine top-5. ADC error only
    // matters when it reorders across the refine boundary.
    "q127_ivfpq_refined" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebook(emb)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val out = QueryTmp.dir("q127", s, d)
      // one codebook collect threads through pair build AND the
      // refined probe (whose inner ADC probe also shares it) (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      graft.ops.Pq.ivfPqIndexWritePairFrom(emb, "vec_id", "embedding",
        cents, cb, s"$out/ivfpq", s"$out/vecs")
      graft.ops.Pq.ivfPqSearchRefinedFrom(
        emb.filter(col("vec_id") < 2), "vec_id", "embedding",
        s.read.parquet(s"$out/ivfpq"), s.read.parquet(s"$out/vecs"),
        "vec_id", "embedding",
        cents, cb, k = 5, nProbe = 2,
        refineFactor = 4)
        .orderBy(col("qid"), col("cos_sim").desc, col("vec_id"))
    }),

    // q120's flag semantics through the IVF-PQ index — the
    // no-full-vector dedup regime: the probed cells' scan reads
    // (id, pq_code) only, top-1 by ADC squared distance (k=1 min_by
    // partial aggregate, window-free), keep = no indexed neighbor
    // within tauDist. tauDist 1.2 is q120's cos 0.4 mapped through
    // ‖a−b‖² = 2−2·cos for unit vectors — the fixture embeddings are
    // near-unit, so the flag SPLITS at sf0.001/0.01 like q120's does.
    "q133_semantic_dedup_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebook(emb)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isBatch = col("vec_id") % 10 === 9
      val out = QueryTmp.dir("q133", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      graft.ops.Pq.ivfPqIndexWriteFrom(emb.filter(!isBatch), "vec_id",
        "embedding", cents, cb, s"$out/ivfpq")
      graft.ops.Pq.semanticDedupFlagsPqFrom(
        emb.filter(isBatch), "vec_id", "embedding",
        s.read.parquet(s"$out/ivfpq"), "vec_id",
        cents, cb, tauDist = 1.2, nProbe = 2)
        .orderBy("vec_id")
    }),

    // The streaming SEMANTIC dedup ingest's read/write path under the
    // batch oracle gate — q131's pattern for the EMBEDDING family:
    // epoch 0 ingests the 90% corpus against an empty prior (everything
    // keeps and indexes batch-keyed under _batch=0/cell=), epoch 1
    // ingests the 10% batch through the SAME time-travel prior read
    // (_batch < 1), codebook-stamp sidecar check, and cell-keyed index
    // layout the stream uses; the returned frame is epoch 1's flags
    // read back from the flags tree, so the write path is under the
    // gate too. Shares q120's oracle verbatim: with this split the
    // epoch-1 flags are exactly the batch-vs-corpus semantic-dedup
    // pure function (id spaces disjoint, so excludeSelf is moot).
    "q135_semantic_ingest" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isBatch = col("vec_id") % 10 === 9
      val root = QueryTmp.dir("q135", s, d)
      // one codebook collect for BOTH epochs (r19): the multi-batch
      // driver threads the collected centroids through each batch body
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      def ingest(df: DataFrame, b: Long): Unit =
        graft.streaming.IdempotentSink.semanticIngestByBatchFrom(
          s"$root/idx", s"$root/flags", "vec_id", "embedding",
          cents, tau = 0.4, nProbe = 2)(df, b)
      ingest(emb.filter(!isBatch), 0L)
      ingest(emb.filter(isBatch), 1L)
      s.read.parquet(s"$root/flags")
        .filter(col("_batch").cast("long") === 1L)
        .select(col("vec_id"), col("neighbor_id"), col("cos_sim"),
          col("keep"))
        .orderBy("vec_id")
    }),

    // q133's split through the SYMMETRIC probe (SDC): the batch ships
    // CODES, not per-query LUTs — the large-batch dedup regime where
    // the ADC variant's |batch|·m·k-double broadcast is the bound.
    // Scored via the shared m·k² code-to-code table; tauDist comes
    // from the managed calibration (boundary pairs at cos 0.8 over the
    // corpus subset, mode "sdc") — the oracle re-derives the identical
    // τ in SQL, so the calibration recipe is hash-gated too.
    "q140_semantic_dedup_sdc" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // k=16 (256 code points) over a 10% corpus subset: with the k=4
      // fixture codebook every one of its 16 codes is occupied at gate
      // scale and every SDC top-1 is an exact code collision (distance
      // 0 — measured, first cut) — the sparser regime keeps most batch
      // codes unoccupied so the distances and the flag actually split
      val cb = fixturePqCodebookK(emb, 16)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isCorpus = col("vec_id") % 10 === 0
      val isBatch = col("vec_id") % 10 === 9
      val tau = graft.ops.Pq.calibrateTauDist(emb.filter(isCorpus),
        "vec_id", "embedding", cb, cosThreshold = 0.8, mode = "sdc")
      val out = QueryTmp.dir("q140", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      graft.ops.Pq.ivfPqIndexWriteFrom(emb.filter(isCorpus), "vec_id",
        "embedding", cents, cb, s"$out/ivfpq")
      graft.ops.Pq.semanticDedupFlagsPqSdcFrom(
        emb.filter(isBatch), "vec_id", "embedding",
        s.read.parquet(s"$out/ivfpq"), "vec_id",
        cents, cb, tauDist = tau, nProbe = 2)
        .orderBy("vec_id")
    }),

    // HYBRID dedup under the gate: the whole batch probes via SDC
    // (m-byte codes), and only the STRADDLERS — best symmetric
    // distance within band of τ_sdc — get their top-4 SDC candidates
    // ADC-rescored and re-flagged at τ_adc (both thresholds
    // boundary-calibrated at cos 0.8 under the k=16 codebook; the
    // oracle re-derives both). Closes the SDC recall notch where it
    // lives, at band-sized ADC cost (SEMINGEST_PQ_SDC_1m_f10_r17
    // measured the notch; PqSpec pins the band=0/band=∞ algebra).
    "q145_semantic_dedup_pq_hybrid" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebookK(emb, 16)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isCorpus = col("vec_id") % 10 === 0
      val isBatch = col("vec_id") % 10 === 9
      // both τs from ONE sample collect + ONE boundary-score pass —
      // value-identical to the two single-mode calls (r18 optimization)
      val (tauA, tauS) = graft.ops.Pq.calibrateTauDistBoth(
        emb.filter(isCorpus), "vec_id", "embedding", cb,
        cosThreshold = 0.8)
      val out = QueryTmp.dir("q145", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      graft.ops.Pq.ivfPqIndexWriteFrom(emb.filter(isCorpus), "vec_id",
        "embedding", cents, cb, s"$out/ivfpq")
      graft.ops.Pq.semanticDedupFlagsPqHybridFrom(
        emb.filter(isBatch), "vec_id", "embedding",
        s.read.parquet(s"$out/ivfpq"), "vec_id",
        cents, cb, tauSdc = tauS, tauAdc = tauA,
        band = 0.2, refineK = 4, nProbe = 2)
        .orderBy("vec_id")
    }),

    // q144: q133's ADC dedup with the threshold CALIBRATED by
    // Pq.calibrateTauDist (boundary pairs at cos 0.9 over the corpus
    // subset) instead of a hand-picked literal — the operator-ized
    // τ-recipe under the oracle gate (the SQL derives the same τ).
    "q144_semantic_dedup_pq_calibrated" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebook(emb)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isBatch = col("vec_id") % 10 === 9
      val tau = graft.ops.Pq.calibrateTauDist(emb.filter(!isBatch),
        "vec_id", "embedding", cb, cosThreshold = 0.9, mode = "adc")
      val out = QueryTmp.dir("q144", s, d)
      // one codebook collect threads through build AND probe (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      graft.ops.Pq.ivfPqIndexWriteFrom(emb.filter(!isBatch), "vec_id",
        "embedding", cents, cb, s"$out/ivfpq")
      graft.ops.Pq.semanticDedupFlagsPqFrom(
        emb.filter(isBatch), "vec_id", "embedding",
        s.read.parquet(s"$out/ivfpq"), "vec_id",
        cents, cb, tauDist = tau, nProbe = 2)
        .orderBy("vec_id")
    }),

    // q135's two-epoch ingest through the NO-FULL-VECTOR streaming
    // twin: epoch 0 ingests the 90% corpus (everything keeps; only
    // (id, pq_code, cell) rows land, batch-keyed), epoch 1 flags the
    // 10% batch by ADC top-1 against the accumulated code tree via the
    // same `_batch < 1` time-travel read and combined IVF+PQ stamp the
    // stream uses. Shares q133's oracle verbatim: with this split the
    // epoch-1 flags are exactly the batch-vs-corpus PQ semantic-dedup
    // pure function (id spaces disjoint, so excludeSelf is moot).
    "q138_semantic_ingest_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebook(emb)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isBatch = col("vec_id") % 10 === 9
      val tau = graft.ops.Pq.calibrateTauDist(emb.filter(!isBatch),
        "vec_id", "embedding", cb, cosThreshold = 0.9, mode = "adc")
      val root = QueryTmp.dir("q138", s, d)
      // one codebook collect for BOTH epochs (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      def ingest(df: DataFrame, b: Long): Unit =
        graft.streaming.IdempotentSink.semanticIngestPqByBatchFrom(
          s"$root/idx", s"$root/flags", "vec_id", "embedding",
          cents, cb, tauDist = tau, nProbe = 2)(df, b)
      ingest(emb.filter(!isBatch), 0L)
      ingest(emb.filter(isBatch), 1L)
      s.read.parquet(s"$root/flags")
        .filter(col("_batch").cast("long") === 1L)
        .select(col("vec_id"), col("neighbor_id"), col("adc_dist"),
          col("keep"))
        .orderBy("vec_id")
    }),

    // q140's SDC dedup through the STREAMING ingest's sdc probe mode —
    // the wiring the large-batch regime exists for (a micro-batch IS a
    // large query batch): epoch 0 ingests the 10% corpus subset
    // (everything keeps; (id, pq_code, cell) rows land batch-keyed
    // under the combined IVF+PQ stamp), epoch 1 flags the batch via
    // the SYMMETRIC kernel — m-byte query codes against the shared
    // m·k² table, chunked automatically past the broadcast ceiling —
    // through the same `_batch < 1` time-travel read as q138. Shares
    // q140's oracle verbatim: with this split the epoch-1 flags are
    // exactly the batch-vs-corpus SDC pure function.
    "q141_semantic_ingest_pq_sdc" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebookK(emb, 16)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isCorpus = col("vec_id") % 10 === 0
      val isBatch = col("vec_id") % 10 === 9
      val tau = graft.ops.Pq.calibrateTauDist(emb.filter(isCorpus),
        "vec_id", "embedding", cb, cosThreshold = 0.8, mode = "sdc")
      val root = QueryTmp.dir("q141", s, d)
      // one codebook collect for BOTH epochs (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      def ingest(df: DataFrame, b: Long): Unit =
        graft.streaming.IdempotentSink.semanticIngestPqByBatchFrom(
          s"$root/idx", s"$root/flags", "vec_id", "embedding",
          cents, cb, tauDist = tau, nProbe = 2,
          probeMode = "sdc")(df, b)
      ingest(emb.filter(isCorpus), 0L)
      ingest(emb.filter(isBatch), 1L)
      s.read.parquet(s"$root/flags")
        .filter(col("_batch").cast("long") === 1L)
        .select(col("vec_id"), col("neighbor_id"), col("sdc_dist"),
          col("keep"))
        .orderBy("vec_id")
    }),

    // q145's HYBRID dedup through the STREAMING ingest's hybrid probe
    // mode — the r17 notch-closer wired into the production path: the
    // micro-batch probes via SDC (m-byte codes), and only the
    // straddlers (best symmetric distance within band of τ_sdc) get
    // ADC-rescored at τ_adc, both thresholds boundary-calibrated.
    // Epoch 0 ingests the 10% corpus subset, epoch 1 flags the batch
    // through the same `_batch < 1` time-travel read as q138/q141.
    // Shares q145's oracle verbatim: with this split the epoch-1
    // flags are exactly the batch-vs-corpus hybrid pure function.
    "q146_semantic_ingest_pq_hybrid" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = fixturePqCodebookK(emb, 16)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val isCorpus = col("vec_id") % 10 === 0
      val isBatch = col("vec_id") % 10 === 9
      // both τs from ONE sample collect + ONE boundary-score pass —
      // value-identical to the two single-mode calls (r18 optimization)
      val (tauA, tauS) = graft.ops.Pq.calibrateTauDistBoth(
        emb.filter(isCorpus), "vec_id", "embedding", cb,
        cosThreshold = 0.8)
      val root = QueryTmp.dir("q146", s, d)
      // one codebook collect for BOTH epochs (r19)
      val cents = Similarity.collectCodebook(centroids, "cid", "cvec")
      def ingest(df: DataFrame, b: Long): Unit =
        graft.streaming.IdempotentSink.semanticIngestPqByBatchFrom(
          s"$root/idx", s"$root/flags", "vec_id", "embedding",
          cents, cb, tauDist = tauS, nProbe = 2,
          probeMode = "hybrid", tauAdc = tauA, band = 0.2,
          refineK = 4)(df, b)
      ingest(emb.filter(isCorpus), 0L)
      ingest(emb.filter(isBatch), 1L)
      s.read.parquet(s"$root/flags")
        .filter(col("_batch").cast("long") === 1L)
        .select(col("vec_id"), col("neighbor_id"), col("sdc_dist"),
          col("keep"))
        .orderBy("vec_id")
    }),

    // One Lloyd iteration over the 8-centroid codebook: the offline
    // k-means step that builds the IVF index.
    "q90_kmeans_step" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.kmeansStep(emb, "vec_id", "embedding",
        centroids, "cid", "cvec")
        .orderBy("cell", "dim")
    })
  )

  /** m=2 × k PQ codebook whose sub-centroid c in subspace j is the
    * j-th HALF of fixture vector c (vec_id < k) — data-derived, like
    * q59's centroids, so the DuckDB oracle reconstructs the identical
    * codebook from the table (subspace j of index i = (i−1)//32).
    */
  private def fixturePqCodebookK(emb: DataFrame, k: Int)
  : graft.ops.Pq.Codebook = {
    val rows = emb.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1))
    require(rows.length == k, s"PQ fixture codebook needs vec_id 0..${k - 1}")
    val dsub = rows(0).length / 2
    val flat = (0 until 2).flatMap(j => (0 until k).flatMap(c =>
      rows(c).slice(j * dsub, (j + 1) * dsub))).toIndexedSeq
    graft.ops.Pq.Codebook(flat, 2, k)
  }

  private def fixturePqCodebook(emb: DataFrame): graft.ops.Pq.Codebook =
    fixturePqCodebookK(emb, 4)

  /** Shared oracle prefix for the PQ family: re-derive the m=2 × k
    * data-derived codebook and every vector's code in SQL. `//` is
    * DuckDB integer division (= Spark `div`); subscripts are 1-based.
    */
  private def pqPrefixK(k: Int): String =
    s"""WITH ax AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding)::DOUBLE AS x
       |  FROM embeddings),
       |sub AS (
       |  SELECT vec_id, (i - 1) // 32 AS j, (i - 1) % 32 AS t, x FROM ax),
       |pcent AS (SELECT vec_id AS c, j, t, x FROM sub WHERE vec_id < $k),
       |pqd AS (
       |  SELECT s.vec_id, s.j, p.c, sum((s.x - p.x) * (s.x - p.x)) AS d
       |  FROM sub s JOIN pcent p ON p.j = s.j AND p.t = s.t
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, j, c AS code FROM (
       |    SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j
       |      ORDER BY d ASC, c ASC) AS rn FROM pqd) WHERE rn = 1)""".stripMargin

  private val pqPrefix = pqPrefixK(4)

  /** [[graft.ops.Pq.calibrateTauDist]]'s boundary-pair construction in
    * SQL — CTEs to splice after a [[pqPrefixK]] prefix (`ax`, `pcent`,
    * `pqd`, `codes` in scope; for mode "sdc" also `sdct`): for each
    * calibration-sample vector, its same-norm partner at exactly
    * cos = `cosT` (rotate toward the Gram-Schmidt residual of the
    * vector's own circular coordinate shift), the partner's codes, and
    * `tau` = the mean pair distance under the chosen kernel. The skip
    * guards (zero-norm ≥ 1e-12, no-residual ≥ 1e-9) mirror the
    * operator's exactly.
    */
  private def calibCtes(mode: String, cosT: Double,
      samplePred: String, p: String = "cal",
      tauName: String = "tau"): String = {
    val sinT = s"sqrt(1 - $cosT*$cosT)"
    val pair = if (mode == "adc")
      s"""${p}_pair AS (
         |  SELECT dx.vec_id, sum(dx.d) AS dist
         |  FROM pqd dx JOIN ${p}_codesp cp
         |    ON cp.vec_id = dx.vec_id AND cp.j = dx.j AND cp.code = dx.c
         |  GROUP BY dx.vec_id)""".stripMargin
    else
      s"""${p}_pair AS (
         |  SELECT cx.vec_id, sum(t.d) AS dist
         |  FROM codes cx
         |  JOIN ${p}_codesp cp ON cp.vec_id = cx.vec_id AND cp.j = cx.j
         |  JOIN sdct t ON t.j = cx.j AND t.ca = cx.code AND t.cb = cp.code
         |  WHERE cx.vec_id IN (SELECT vec_id FROM ${p}_samp)
         |  GROUP BY cx.vec_id)""".stripMargin
    s""",
       |${p}_samp AS (
       |  SELECT vec_id, i, x FROM ax WHERE $samplePred),
       |${p}_nrm AS (
       |  SELECT vec_id, sqrt(sum(x*x)) AS n FROM ${p}_samp GROUP BY 1),
       |${p}_xh AS (
       |  SELECT s.vec_id, s.i, s.x / n.n AS h
       |  FROM ${p}_samp s JOIN ${p}_nrm n USING (vec_id)
       |  WHERE n.n >= 1e-12),
       |${p}_dim AS (SELECT vec_id, max(i) AS d FROM ${p}_xh GROUP BY 1),
       |${p}_sh AS (
       |  SELECT a.vec_id, a.i, b.h AS s
       |  FROM ${p}_xh a JOIN ${p}_dim USING (vec_id)
       |  JOIN ${p}_xh b ON b.vec_id = a.vec_id
       |    AND b.i = CASE WHEN a.i = 1 THEN ${p}_dim.d ELSE a.i - 1 END),
       |${p}_proj AS (
       |  SELECT s.vec_id, sum(s.s * h.h) AS p
       |  FROM ${p}_sh s JOIN ${p}_xh h
       |    ON h.vec_id = s.vec_id AND h.i = s.i
       |  GROUP BY s.vec_id),
       |${p}_resid AS (
       |  SELECT s.vec_id, s.i, s.s - p.p * h.h AS r
       |  FROM ${p}_sh s JOIN ${p}_proj p USING (vec_id)
       |  JOIN ${p}_xh h ON h.vec_id = s.vec_id AND h.i = s.i),
       |${p}_rn AS (
       |  SELECT vec_id, sqrt(sum(r*r)) AS rn FROM ${p}_resid GROUP BY 1),
       |${p}_xp AS (
       |  SELECT r.vec_id, r.i,
       |    n.n * ($cosT * h.h + $sinT * r.r / rr.rn) AS x
       |  FROM ${p}_resid r JOIN ${p}_rn rr USING (vec_id)
       |  JOIN ${p}_nrm n USING (vec_id)
       |  JOIN ${p}_xh h ON h.vec_id = r.vec_id AND h.i = r.i
       |  WHERE rr.rn >= 1e-9),
       |${p}_subp AS (
       |  SELECT vec_id, (i - 1) // 32 AS j, (i - 1) % 32 AS t, x
       |  FROM ${p}_xp),
       |${p}_pqdp AS (
       |  SELECT s.vec_id, s.j, p.c, sum((s.x - p.x) * (s.x - p.x)) AS d
       |  FROM ${p}_subp s JOIN pcent p ON p.j = s.j AND p.t = s.t
       |  GROUP BY 1, 2, 3),
       |${p}_codesp AS (
       |  SELECT vec_id, j, c AS code FROM (
       |    SELECT vec_id, j, c, row_number() OVER (
       |      PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
       |    FROM ${p}_pqdp) WHERE rn = 1),
       |$pair,
       |$tauName AS (SELECT avg(dist) AS t FROM ${p}_pair)""".stripMargin
  }

  /** The ADC semantic-dedup oracle TAIL (splice after [[pqPrefixK]] —
    * and optionally [[calibCtes]] — so the threshold expression can be
    * a literal or the calibrated `(SELECT t FROM tau)`): q126's ADC
    * probe specialized to k = 1 over the 90% corpus, batch LEFT-joined
    * back so probed-cell misses surface as NULL neighbors (keep).
    */
  private def pqDedupAdcTail(tauExpr: String): String =
    s""",
       |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
       |cdists AS (
       |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
       |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
       |assigned AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d ASC, cid ASC) AS rn
       |    FROM cdists WHERE vec_id % 10 <> 9) WHERE rn = 1),
       |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 10 = 9),
       |probe AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
       |      ORDER BY d.d ASC, d.cid ASC) AS rn
       |    FROM qids q JOIN cdists d ON d.vec_id = q.qid)
       |  WHERE rn <= 2),
       |cand AS (
       |  SELECT p.qid, a.vec_id
       |  FROM assigned a JOIN probe p ON a.cell = p.cid
       |  WHERE a.vec_id <> p.qid),
       |qlut AS (SELECT vec_id AS qid, j, c, d FROM pqd
       |  WHERE vec_id % 10 = 9),
       |adc AS (
       |  SELECT cd.qid, cd.vec_id, sum(q.d) AS adc
       |  FROM cand cd
       |  JOIN codes co ON co.vec_id = cd.vec_id
       |  JOIN qlut q ON q.qid = cd.qid AND q.j = co.j AND q.c = co.code
       |  GROUP BY 1, 2),
       |top1 AS (
       |  SELECT qid, vec_id AS neighbor_id, adc_dist FROM (
       |    SELECT qid, vec_id, ROUND(adc, 5) AS adc_dist,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY ROUND(adc, 5) ASC, vec_id ASC) AS rn
       |    FROM adc) WHERE rn = 1)
       |SELECT q.qid AS vec_id, t.neighbor_id, t.adc_dist,
       |  (t.adc_dist IS NULL OR t.adc_dist > $tauExpr) AS keep
       |FROM qids q LEFT JOIN top1 t ON t.qid = q.qid
       |ORDER BY vec_id""".stripMargin

  /** The SDC semantic-dedup oracle TAIL (after [[pqPrefixK]](16) + the
    * `sdct` CTE — and optionally [[calibCtes]]): each candidate scores
    * Σ_j sdct[j, qcode_j, ccode_j], both sides quantized — exactly
    * what Pq.sdcTable + pq_sdc compute. Corpus = vec_id % 10 = 0.
    */
  private def pqDedupSdcTail(tauExpr: String): String =
    s""",
       |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
       |cdists AS (
       |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
       |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
       |assigned AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d ASC, cid ASC) AS rn
       |    FROM cdists WHERE vec_id % 10 = 0) WHERE rn = 1),
       |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 10 = 9),
       |probe AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
       |      ORDER BY d.d ASC, d.cid ASC) AS rn
       |    FROM qids q JOIN cdists d ON d.vec_id = q.qid)
       |  WHERE rn <= 2),
       |cand AS (
       |  SELECT p.qid, a.vec_id
       |  FROM assigned a JOIN probe p ON a.cell = p.cid
       |  WHERE a.vec_id <> p.qid),
       |sdc AS (
       |  SELECT cd.qid, cd.vec_id, sum(t.d) AS sdc
       |  FROM cand cd
       |  JOIN codes qc ON qc.vec_id = cd.qid
       |  JOIN codes cc ON cc.vec_id = cd.vec_id AND cc.j = qc.j
       |  JOIN sdct t ON t.j = qc.j AND t.ca = qc.code AND t.cb = cc.code
       |  GROUP BY 1, 2),
       |top1 AS (
       |  SELECT qid, vec_id AS neighbor_id, sdc_dist FROM (
       |    SELECT qid, vec_id, ROUND(sdc, 5) AS sdc_dist,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY ROUND(sdc, 5) ASC, vec_id ASC) AS rn
       |    FROM sdc) WHERE rn = 1)
       |SELECT q.qid AS vec_id, t.neighbor_id, t.sdc_dist,
       |  (t.sdc_dist IS NULL OR t.sdc_dist > $tauExpr) AS keep
       |FROM qids q LEFT JOIN top1 t ON t.qid = q.qid
       |ORDER BY vec_id""".stripMargin

  private val sdctCte =
    """,
      |sdct AS (
      |  SELECT a.j, a.c AS ca, b.c AS cb,
      |         sum((a.x - b.x) * (a.x - b.x)) AS d
      |  FROM pcent a JOIN pcent b ON a.j = b.j AND a.t = b.t
      |  GROUP BY 1, 2, 3)""".stripMargin

  /** The IVF probe-search oracle, shared verbatim by q88 (inline
    * assignment) and q114 (persisted index): the index changes where
    * the assignment lives, not what the probe computes.
    */
  private val ivfSearchSql =
    """WITH ax AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |         unnest(embedding)::DOUBLE AS x
      |  FROM embeddings),
      |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
      |dists AS (
      |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
      |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
      |assigned AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY d ASC, cid ASC) AS rn
      |    FROM dists) WHERE rn = 1),
      |probe AS (
      |  SELECT cid FROM dists WHERE vec_id = 0
      |  ORDER BY d ASC, cid ASC LIMIT 2),
      |qx AS (SELECT i, x FROM ax WHERE vec_id = 0),
      |nq AS (SELECT sqrt(sum(x * x)) AS n FROM qx),
      |cand AS (
      |  SELECT vec_id, cell FROM assigned
      |  WHERE cell IN (SELECT cid FROM probe) AND vec_id <> 0),
      |dots AS (
      |  SELECT a.vec_id, sum(a.x * q.x) AS dot, sqrt(sum(a.x * a.x)) AS na
      |  FROM ax a JOIN qx q USING (i)
      |  WHERE a.vec_id IN (SELECT vec_id FROM cand)
      |  GROUP BY a.vec_id)
      |SELECT d2.vec_id, c.cell, ROUND(dot / (na * nq.n), 5) AS cos_sim
      |FROM dots d2 JOIN cand c ON c.vec_id = d2.vec_id, nq
      |ORDER BY cos_sim DESC, d2.vec_id LIMIT 5""".stripMargin

  private val duckBucket =
    """(CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END +
      | CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END +
      | CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END)""".stripMargin

  def oracle: Map[String, String] = oracleBase +
    // identical SQL to q144 on purpose (q133's dedup + the calibrated
    // τ the ingest now derives): the PQ ingest's epoch-1 flags are the
    // batch-vs-(pq_code corpus) pure function — the oracle asserts the
    // streaming tree's time-travel read, combined-stamp check, and
    // batch-keyed code write change nothing
    ("q138_semantic_ingest_pq" ->
      oracleBase("q144_semantic_dedup_pq_calibrated")) +
    // identical SQL to q140 on purpose: the SDC probe mode changes the
    // kernel the stream flags with, not the flags' meaning
    ("q141_semantic_ingest_pq_sdc" ->
      oracleBase("q140_semantic_dedup_sdc")) +
    // identical SQL to q145 on purpose: the hybrid probe mode changes
    // the kernel the stream flags with, not the flags' meaning
    ("q146_semantic_ingest_pq_hybrid" ->
      oracleBase("q145_semantic_dedup_pq_hybrid")) +
    // identical SQL to q115 on purpose: with every super-group probed
    // the hierarchical probe selection is exact by construction
    ("q142_ivf_batch_hier" -> oracleBase("q115_ivf_batch_search"))

  private def oracleBase: Map[String, String] = Map(
    "q90_kmeans_step" ->
      """WITH ax AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |dists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |    FROM dists) WHERE rn = 1)
        |SELECT cell, CAST(i AS INTEGER) AS dim, ROUND(AVG(x), 5) AS mean,
        |  COUNT(*) AS n
        |FROM assigned JOIN ax USING (vec_id)
        |GROUP BY cell, dim ORDER BY cell, dim""".stripMargin,

    "q88_ivf_search" -> ivfSearchSql,

    // Same oracle as q88 by construction: the persisted index changes
    // WHERE the assignment lives, not what the probe computes.
    "q114_ivf_indexed" -> ivfSearchSql,
    // identical SQL to q114 on purpose: a migrated index must answer
    // exactly as one freshly built under the target codebook
    "q139_ivf_migrated" -> ivfSearchSql,

    // Same oracle again: an append-built layout (90% build + 10%
    // append under the same stamped codebook) must answer exactly like
    // a single-shot build over the full corpus.
    "q121_ivf_append" -> ivfSearchSql,

    // q88's probe generalized over a query SET (vec_id < 2), ranked
    // per query on the ROUNDED score with id tie-break — the same
    // determinism rule the Spark window uses.
    "q115_ivf_batch_search" ->
      """WITH ax AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |dists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |    FROM dists) WHERE rn = 1),
        |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 2),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY d.d ASC, d.cid ASC) AS rn
        |    FROM qids q JOIN dists d ON d.vec_id = q.qid)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.qid, a.vec_id, a.cell
        |  FROM assigned a JOIN probe p ON a.cell = p.cid
        |  WHERE a.vec_id <> p.qid),
        |qx AS (
        |  SELECT q.qid, ax.i, ax.x FROM ax JOIN qids q
        |  ON ax.vec_id = q.qid),
        |nq AS (SELECT qid, sqrt(sum(x * x)) AS n FROM qx GROUP BY qid),
        |dots AS (
        |  SELECT c.qid, a.vec_id, sum(a.x * q.x) AS dot,
        |         sqrt(sum(a.x * a.x)) AS na
        |  FROM cand c JOIN ax a ON a.vec_id = c.vec_id
        |  JOIN qx q ON q.qid = c.qid AND q.i = a.i
        |  GROUP BY c.qid, a.vec_id),
        |ranked AS (
        |  SELECT d.qid, d.vec_id, c.cell,
        |    ROUND(dot / (na * nq.n), 5) AS cos_sim,
        |    row_number() OVER (PARTITION BY d.qid
        |      ORDER BY ROUND(dot / (na * nq.n), 5) DESC, d.vec_id ASC)
        |      AS rn
        |  FROM dots d
        |  JOIN cand c ON c.qid = d.qid AND c.vec_id = d.vec_id
        |  JOIN nq ON nq.qid = d.qid)
        |SELECT qid, vec_id, cell, cos_sim FROM ranked WHERE rn <= 5
        |ORDER BY qid, cos_sim DESC, vec_id""".stripMargin,

    // q115's probe CTEs specialized to k = 1 over the 90% corpus, with
    // the batch LEFT-joined back so probed-cell misses surface as NULL
    // neighbors (keep = true). Assignment excludes the batch; probe
    // distances exist for every vector.
    "q120_semantic_dedup" ->
      """WITH ax AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |dists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |    FROM dists WHERE vec_id % 10 <> 9) WHERE rn = 1),
        |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 10 = 9),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY d.d ASC, d.cid ASC) AS rn
        |    FROM qids q JOIN dists d ON d.vec_id = q.qid)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.qid, a.vec_id, a.cell
        |  FROM assigned a JOIN probe p ON a.cell = p.cid
        |  WHERE a.vec_id <> p.qid),
        |qx AS (
        |  SELECT q.qid, ax.i, ax.x FROM ax JOIN qids q
        |  ON ax.vec_id = q.qid),
        |nq AS (SELECT qid, sqrt(sum(x * x)) AS n FROM qx GROUP BY qid),
        |dots AS (
        |  SELECT c.qid, a.vec_id, sum(a.x * q.x) AS dot,
        |         sqrt(sum(a.x * a.x)) AS na
        |  FROM cand c JOIN ax a ON a.vec_id = c.vec_id
        |  JOIN qx q ON q.qid = c.qid AND q.i = a.i
        |  GROUP BY c.qid, a.vec_id),
        |top1 AS (
        |  SELECT qid, vec_id AS neighbor_id, cos_sim FROM (
        |    SELECT d.qid, d.vec_id,
        |      ROUND(dot / (na * nq.n), 5) AS cos_sim,
        |      row_number() OVER (PARTITION BY d.qid
        |        ORDER BY ROUND(dot / (na * nq.n), 5) DESC, d.vec_id ASC)
        |        AS rn
        |    FROM dots d JOIN nq ON nq.qid = d.qid)
        |  WHERE rn = 1)
        |SELECT q.qid AS vec_id, t.neighbor_id, t.cos_sim,
        |  (t.cos_sim IS NULL OR t.cos_sim < 0.4) AS keep
        |FROM qids q LEFT JOIN top1 t ON t.qid = q.qid
        |ORDER BY vec_id""".stripMargin,

    // identical SQL to q120 on purpose: the two-epoch ingest's epoch-1
    // flags are the batch-vs-corpus pure function — the oracle asserts
    // the time-travel read/batch-keyed write path changes nothing
    "q135_semantic_ingest" ->
      """WITH ax AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |dists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |    FROM dists WHERE vec_id % 10 <> 9) WHERE rn = 1),
        |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 10 = 9),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY d.d ASC, d.cid ASC) AS rn
        |    FROM qids q JOIN dists d ON d.vec_id = q.qid)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.qid, a.vec_id, a.cell
        |  FROM assigned a JOIN probe p ON a.cell = p.cid
        |  WHERE a.vec_id <> p.qid),
        |qx AS (
        |  SELECT q.qid, ax.i, ax.x FROM ax JOIN qids q
        |  ON ax.vec_id = q.qid),
        |nq AS (SELECT qid, sqrt(sum(x * x)) AS n FROM qx GROUP BY qid),
        |dots AS (
        |  SELECT c.qid, a.vec_id, sum(a.x * q.x) AS dot,
        |         sqrt(sum(a.x * a.x)) AS na
        |  FROM cand c JOIN ax a ON a.vec_id = c.vec_id
        |  JOIN qx q ON q.qid = c.qid AND q.i = a.i
        |  GROUP BY c.qid, a.vec_id),
        |top1 AS (
        |  SELECT qid, vec_id AS neighbor_id, cos_sim FROM (
        |    SELECT d.qid, d.vec_id,
        |      ROUND(dot / (na * nq.n), 5) AS cos_sim,
        |      row_number() OVER (PARTITION BY d.qid
        |        ORDER BY ROUND(dot / (na * nq.n), 5) DESC, d.vec_id ASC)
        |        AS rn
        |    FROM dots d JOIN nq ON nq.qid = d.qid)
        |  WHERE rn = 1)
        |SELECT q.qid AS vec_id, t.neighbor_id, t.cos_sim,
        |  (t.cos_sim IS NULL OR t.cos_sim < 0.4) AS keep
        |FROM qids q LEFT JOIN top1 t ON t.qid = q.qid
        |ORDER BY vec_id""".stripMargin,

    "q59_ivf_cells" ->
      """WITH ax AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |dists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |best AS (
        |  SELECT vec_id, cid, ROUND(d, 5) AS d5,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |  FROM dists)
        |SELECT cid AS cell, COUNT(*) AS n_vecs, MIN(vec_id) AS min_id,
        |  ROUND(AVG(d5), 4) AS avg_dist2
        |FROM best WHERE rn = 1 GROUP BY cell ORDER BY cell""".stripMargin,

    // q122 shares q59's FLAT-assignment oracle on purpose: the
    // hierarchical router must agree with flat on every fixture row
    // for the hash to match (see the queries-side comment).
    "q122_ivf_hier_cells" ->
      """WITH ax AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |dists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |best AS (
        |  SELECT vec_id, cid, ROUND(d, 5) AS d5,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |  FROM dists)
        |SELECT cid AS cell, COUNT(*) AS n_vecs, MIN(vec_id) AS min_id,
        |  ROUND(AVG(d5), 4) AS avg_dist2
        |FROM best WHERE rn = 1 GROUP BY cell ORDER BY cell""".stripMargin,

    "q124_pq_codes" -> (pqPrefix +
      """,
        |wide AS (
        |  SELECT vec_id, MAX(CASE WHEN j = 0 THEN code END) AS code0,
        |         MAX(CASE WHEN j = 1 THEN code END) AS code1
        |  FROM codes GROUP BY vec_id)
        |SELECT code0, code1, COUNT(*) AS n_vecs, MIN(vec_id) AS min_id
        |FROM wide GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q125_pq_adc_search" -> (pqPrefix +
      """,
        |qlut AS (SELECT vec_id AS qid, j, c, d FROM pqd WHERE vec_id < 2),
        |adc AS (
        |  SELECT q.qid, co.vec_id, sum(q.d) AS adc
        |  FROM codes co JOIN qlut q ON q.j = co.j AND q.c = co.code
        |  WHERE co.vec_id <> q.qid
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT qid, vec_id, ROUND(adc, 5) AS adc_dist,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY ROUND(adc, 5) ASC, vec_id ASC) AS rn
        |  FROM adc)
        |SELECT qid, vec_id, adc_dist FROM ranked WHERE rn <= 5
        |ORDER BY qid, adc_dist, vec_id""".stripMargin),

    "q126_ivfpq_search" -> (pqPrefix +
      """,
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |cdists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |    FROM cdists) WHERE rn = 1),
        |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 2),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY d.d ASC, d.cid ASC) AS rn
        |    FROM qids q JOIN cdists d ON d.vec_id = q.qid)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.qid, a.vec_id, a.cell
        |  FROM assigned a JOIN probe p ON a.cell = p.cid
        |  WHERE a.vec_id <> p.qid),
        |qlut AS (SELECT vec_id AS qid, j, c, d FROM pqd WHERE vec_id < 2),
        |adc AS (
        |  SELECT cd.qid, cd.vec_id, cd.cell, sum(q.d) AS adc
        |  FROM cand cd
        |  JOIN codes co ON co.vec_id = cd.vec_id
        |  JOIN qlut q ON q.qid = cd.qid AND q.j = co.j AND q.c = co.code
        |  GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT qid, vec_id, cell, ROUND(adc, 5) AS adc_dist,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY ROUND(adc, 5) ASC, vec_id ASC) AS rn
        |  FROM adc)
        |SELECT qid, vec_id, cell, adc_dist FROM ranked WHERE rn <= 5
        |ORDER BY qid, adc_dist, vec_id""".stripMargin),

    // q126's ADC ranking widened to the top-20 refine set, then exact
    // cosine over ONLY those candidates — the re-rank tail.
    "q127_ivfpq_refined" -> (pqPrefix +
      """,
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |cdists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |    FROM cdists) WHERE rn = 1),
        |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 2),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY d.d ASC, d.cid ASC) AS rn
        |    FROM qids q JOIN cdists d ON d.vec_id = q.qid)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.qid, a.vec_id, a.cell
        |  FROM assigned a JOIN probe p ON a.cell = p.cid
        |  WHERE a.vec_id <> p.qid),
        |qlut AS (SELECT vec_id AS qid, j, c, d FROM pqd WHERE vec_id < 2),
        |adc AS (
        |  SELECT cd.qid, cd.vec_id, sum(q.d) AS adc
        |  FROM cand cd
        |  JOIN codes co ON co.vec_id = cd.vec_id
        |  JOIN qlut q ON q.qid = cd.qid AND q.j = co.j AND q.c = co.code
        |  GROUP BY 1, 2),
        |refine AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY ROUND(adc, 5) ASC, vec_id ASC) AS rn
        |    FROM adc) WHERE rn <= 20),
        |qx AS (
        |  SELECT q.qid, ax.i, ax.x FROM ax JOIN qids q
        |  ON ax.vec_id = q.qid),
        |nq AS (SELECT qid, sqrt(sum(x * x)) AS n FROM qx GROUP BY qid),
        |dots AS (
        |  SELECT r.qid, a.vec_id, sum(a.x * q.x) AS dot,
        |         sqrt(sum(a.x * a.x)) AS na
        |  FROM refine r JOIN ax a ON a.vec_id = r.vec_id
        |  JOIN qx q ON q.qid = r.qid AND q.i = a.i
        |  GROUP BY 1, 2),
        |rr AS (
        |  SELECT d.qid, d.vec_id, ROUND(dot / (na * nq.n), 5) AS cos_sim,
        |    row_number() OVER (PARTITION BY d.qid
        |      ORDER BY ROUND(dot / (na * nq.n), 5) DESC, d.vec_id ASC)
        |      AS rn
        |  FROM dots d JOIN nq ON nq.qid = d.qid)
        |SELECT qid, vec_id, cos_sim FROM rr WHERE rn <= 5
        |ORDER BY qid, cos_sim DESC, vec_id""".stripMargin),

    // q133's oracle with SYMMETRIC scoring: the sdct CTE is the m·k²
    // code-to-code table (pairwise sub-centroid distances), each
    // candidate scores Σ_j sdct[j, qcode_j, ccode_j] — both sides
    // quantized, exactly what Pq.sdcTable + pq_sdc compute — and the
    // threshold is CALIBRATED by the same boundary-pair construction
    // the Spark side runs (Pq.calibrateTauDist, mode "sdc", over the
    // corpus subset), so the recipe is under the gate end-to-end.
    "q140_semantic_dedup_sdc" -> (pqPrefixK(16) + sdctCte +
      calibCtes("sdc", 0.8, "vec_id % 10 = 0") +
      pqDedupSdcTail("(SELECT t FROM tau)")),

    // the HYBRID verdict: SDC top-1/attribution + band test against
    // the calibrated τ_sdc; in-band queries re-flag on the min ADC
    // over their top-4 SDC candidates against the calibrated τ_adc —
    // exactly what semanticDedupFlagsPqHybrid computes
    "q145_semantic_dedup_pq_hybrid" -> (pqPrefixK(16) + sdctCte +
      calibCtes("sdc", 0.8, "vec_id % 10 = 0", p = "cs",
        tauName = "tau_s") +
      calibCtes("adc", 0.8, "vec_id % 10 = 0", p = "ca",
        tauName = "tau_a") +
      """,
        |cx AS (SELECT vec_id AS cid, i, x FROM ax WHERE vec_id < 8),
        |cdists AS (
        |  SELECT a.vec_id, c.cid, sum((a.x - c.x) * (a.x - c.x)) AS d
        |  FROM ax a JOIN cx c USING (i) GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d ASC, cid ASC) AS rn
        |    FROM cdists WHERE vec_id % 10 = 0) WHERE rn = 1),
        |qids AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id % 10 = 9),
        |probe AS (
        |  SELECT qid, cid FROM (
        |    SELECT q.qid, d.cid, row_number() OVER (PARTITION BY q.qid
        |      ORDER BY d.d ASC, d.cid ASC) AS rn
        |    FROM qids q JOIN cdists d ON d.vec_id = q.qid)
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.qid, a.vec_id
        |  FROM assigned a JOIN probe p ON a.cell = p.cid
        |  WHERE a.vec_id <> p.qid),
        |sdc AS (
        |  SELECT cd.qid, cd.vec_id, sum(t.d) AS sdc
        |  FROM cand cd
        |  JOIN codes qc ON qc.vec_id = cd.qid
        |  JOIN codes cc ON cc.vec_id = cd.vec_id AND cc.j = qc.j
        |  JOIN sdct t ON t.j = qc.j AND t.ca = qc.code AND t.cb = cc.code
        |  GROUP BY 1, 2),
        |sdcr AS (
        |  SELECT qid, vec_id, ROUND(sdc, 5) AS d,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY ROUND(sdc, 5) ASC, vec_id ASC) AS rn
        |  FROM sdc),
        |best AS (
        |  SELECT qid, vec_id AS neighbor_id, d AS sdc_dist
        |  FROM sdcr WHERE rn = 1),
        |refine AS (SELECT qid, vec_id FROM sdcr WHERE rn <= 4),
        |qlut AS (SELECT vec_id AS qid, j, c, d FROM pqd
        |  WHERE vec_id % 10 = 9),
        |adcr AS (
        |  SELECT r.qid, r.vec_id, sum(q.d) AS adc
        |  FROM refine r
        |  JOIN codes co ON co.vec_id = r.vec_id
        |  JOIN qlut q ON q.qid = r.qid AND q.j = co.j AND q.c = co.code
        |  GROUP BY 1, 2),
        |ramin AS (
        |  SELECT qid, min(ROUND(adc, 5)) AS amin FROM adcr GROUP BY qid)
        |SELECT q.qid AS vec_id, b.neighbor_id, b.sdc_dist,
        |  CASE WHEN b.sdc_dist IS NOT NULL
        |        AND abs(b.sdc_dist - (SELECT t FROM tau_s)) <= 0.2
        |    THEN (r.amin IS NULL OR r.amin > (SELECT t FROM tau_a))
        |    ELSE (b.sdc_dist IS NULL
        |          OR b.sdc_dist > (SELECT t FROM tau_s)) END AS keep
        |FROM qids q LEFT JOIN best b ON b.qid = q.qid
        |LEFT JOIN ramin r ON r.qid = q.qid
        |ORDER BY vec_id""".stripMargin),

    // q126's ADC probe specialized to k = 1 over the 90% corpus, with
    // the batch LEFT-joined back so probed-cell misses surface as NULL
    // neighbors (keep = true) — q120's oracle shape with ADC distance
    // in place of exact cosine.
    "q133_semantic_dedup_pq" -> (pqPrefix + pqDedupAdcTail("1.2")),

    // q133's dedup with the threshold CALIBRATED instead of literal:
    // both engines derive τ from the same boundary-pair construction
    // (Pq.calibrateTauDist ↔ calibCtes) over the corpus subset, so the
    // oracle gates the calibration RECIPE end-to-end, not just the
    // flags at a hand-picked τ.
    "q144_semantic_dedup_pq_calibrated" -> (pqPrefix +
      calibCtes("adc", 0.9, "vec_id % 10 <> 9") +
      pqDedupAdcTail("(SELECT t FROM tau)")),

    "q55_embedding_norms" ->
      """SELECT vec_id, ROUND(sqrt(sum(x * x)), 5) AS l2_norm
        |FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings)
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q56_knn_cosine" ->
      """WITH ax AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding)::DOUBLE AS x
        |  FROM embeddings),
        |qx AS (SELECT i, x FROM ax WHERE vec_id = 0),
        |nq AS (SELECT sqrt(sum(x * x)) AS n FROM qx),
        |dots AS (
        |  SELECT a.vec_id, sum(a.x * q.x) AS dot, sqrt(sum(a.x * a.x)) AS na
        |  FROM ax a JOIN qx q USING (i) WHERE a.vec_id <> 0
        |  GROUP BY a.vec_id)
        |SELECT vec_id, ROUND(dot / (na * nq.n), 5) AS cos_sim
        |FROM dots, nq ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "q57_lsh_buckets" ->
      s"""SELECT $duckBucket AS bucket, COUNT(*) AS n_vecs,
         |  MIN(vec_id) AS min_id
         |FROM embeddings GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q58_lsh_ann" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, $duckBucket AS bucket FROM embeddings),
         |qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = 0),
         |ax AS (
         |  SELECT b.vec_id, b.bucket, generate_subscripts(embedding, 1) AS i,
         |         unnest(embedding)::DOUBLE AS x
         |  FROM b, qb WHERE b.bucket = qb.qbucket),
         |qx AS (SELECT i, x FROM ax WHERE vec_id = 0),
         |nq AS (SELECT sqrt(sum(x * x)) AS n FROM qx),
         |dots AS (
         |  SELECT a.vec_id, a.bucket, sum(a.x * q.x) AS dot,
         |         sqrt(sum(a.x * a.x)) AS na
         |  FROM ax a JOIN qx q USING (i) WHERE a.vec_id <> 0
         |  GROUP BY a.vec_id, a.bucket)
         |SELECT vec_id, bucket, ROUND(dot / (na * nq.n), 5) AS cos_sim
         |FROM dots, nq ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin
  )
}
