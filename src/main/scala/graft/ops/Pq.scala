package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Product quantization — the MEMORY tier of the ANN family
  * (reference similarity surface `hebrew_alignment_tool.py:351`
  * generalized to corpus scale; the cell/partition tier is
  * [[Similarity]]'s IVF, the code tier is this).
  *
  * Why it exists at 100 TB: an IVF index still stores the full vector
  * per row (d=64 doubles = 512 bytes). At 10⁹ vectors that is ~0.5 TB
  * of embedding payload the probe scan reads; a PQ code is `m` bytes
  * (m=8: 64× less), so the probed cells' scan becomes almost free and
  * a whole-corpus brute rescore stays I/O-bounded at ~m·n bytes.
  * Search uses asymmetric distance computation (ADC): queries stay
  * exact, candidates cost m table lookups each — no per-candidate
  * vector arithmetic. The decode-free layout trades a bounded
  * quantization error, measured in PQ_*_r11.json / SCALE_r11.
  *
  * The kernels ([[graft.functions.PqKernels]]) are native codegen
  * expressions; the flat-codebook layout convention is documented
  * there. Codebooks are driver-sized plan literals (m·k·dsub doubles —
  * m=8,k=256,d=64 ⇒ 128 KB, the same torrent-broadcast footprint class
  * as the IVF codebook literal).
  */
object Pq {

  /** A trained PQ codebook: `flat` is subspace-major
    * (codebook[(j·k + c)·dsub + t]), split into `m` subspaces of `k`
    * sub-centroids each.
    */
  case class Codebook(flat: IndexedSeq[Double], m: Int, k: Int) {
    require(m > 0 && k > 0 && flat.nonEmpty && flat.length % (m * k) == 0,
      s"PQ codebook: ${flat.length} doubles is not m·k·dsub for m=$m k=$k")
    def dsub: Int = flat.length / (m * k)
    def dim: Int = m * dsub

    /** Identity stamp, the PQ analog of the IVF codebook stamp: probing
      * codes encoded under a different codebook silently returns wrong
      * neighbors, so persisted layouts carry (and verify) this.
      */
    def stamp: String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      flat.foreach(x => md.update(String.format(java.util.Locale.ROOT,
        "%.9e,", Double.box(x)).getBytes("UTF-8")))
      s"pq$m/$k/" + md.digest().map("%02x".format(_)).mkString.take(12)
    }
  }

  /** Train per-subspace codebooks with driver-side Lloyd iterations
    * over a DETERMINISTIC bounded sample (the first `sampleN` rows by
    * `idCol` — a TakeOrdered, k·log n work, no full sort). Driver-side
    * on a sample is the standard PQ training regime (codebooks
    * generalize from ~10⁴–10⁵ points; the corpus-scale passes are
    * encode and search, not training) and keeps this collect in the
    * same bounded class as [[Similarity.collectCodebook]].
    *
    * Deterministic: strided init over the sample order, strict-<
    * argmin (ties to the lower index), empty clusters keep their
    * previous mean — same rules as the IVF codebook builder.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      sampleN: Int = 20000, iters: Int = 10): Codebook = {
    val rows = emb.orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .limit(sampleN).collect()
    require(rows.nonEmpty, "Pq.train: empty training sample")
    val dim = rows(0).getSeq[Double](0).length
    require(dim % m == 0, s"Pq.train: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val pts = rows.map(_.getSeq[Double](0).toArray)
    val flat = new Array[Double](m * k * dsub)
    var j = 0
    while (j < m) {
      val off = j * dsub
      val n = pts.length
      // strided init over sample order
      val means = Array.ofDim[Double](k, dsub)
      val stride = math.max(1, n / k)
      var c = 0
      while (c < k) {
        val src = pts(math.min(c * stride, n - 1))
        System.arraycopy(src, off, means(c), 0, dsub)
        c += 1
      }
      val assign = new Array[Int](n)
      var it = 0
      while (it < iters) {
        var i = 0
        while (i < n) {
          var best = -1; var bestD = Double.MaxValue
          var cc = 0
          while (cc < k) {
            var s = 0.0; var t = 0
            while (t < dsub) {
              val d0 = pts(i)(off + t) - means(cc)(t); s += d0 * d0; t += 1
            }
            if (s < bestD) { bestD = s; best = cc }
            cc += 1
          }
          assign(i) = best
          i += 1
        }
        val sums = Array.ofDim[Double](k, dsub)
        val counts = new Array[Int](k)
        i = 0
        while (i < n) {
          val a = assign(i); counts(a) += 1
          var t = 0
          while (t < dsub) { sums(a)(t) += pts(i)(off + t); t += 1 }
          i += 1
        }
        var cc = 0
        while (cc < k) {
          if (counts(cc) > 0) {
            var t = 0
            while (t < dsub) {
              means(cc)(t) = sums(cc)(t) / counts(cc); t += 1
            }
          } // empty cluster keeps its previous mean
          cc += 1
        }
        it += 1
      }
      c = 0
      while (c < k) {
        System.arraycopy(means(c), 0, flat, (j * k + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    Codebook(flat.toIndexedSeq, m, k)
  }

  private def cbLit(cb: Codebook): Column = typedLit(cb.flat)

  /** τ-CALIBRATION as an operator — the executable form of the recipe
    * every PQ-thresholded dedup docstring points at, which until r17
    * lived only in bench code (SemIngestBench) and had to be re-derived
    * from artifacts by every caller. Returns the DISTANCE threshold to
    * pass as `tauDist` to [[semanticDedupFlagsPq]] (mode "adc") /
    * [[semanticDedupFlagsPqSdc]] (mode "sdc") so the flags match an
    * exact-cosine dedup at `cosThreshold` as closely as the
    * quantization allows.
    *
    * METHOD — measured BOUNDARY PAIRS, not a bias formula: for each
    * sample vector x a partner x' is synthesized at EXACTLY
    * cos(x, x') = cosThreshold (rotate x toward a deterministic
    * orthogonal direction — the Gram-Schmidt residual of x's
    * coordinate rotation — by arccos(cosThreshold), same norm), and τ
    * is the mean probe-distance the chosen kernel actually reports for
    * those pairs: ADC scores pq_adc(lut(x), encode(x')), SDC scores
    * the shared-table code pair. That is the decision boundary by
    * construction — whatever lands below it is closer than the
    * threshold pair, in the metric the dedup will really use.
    *
    * Why not the self-distance bias fold-in (τ₀ + E‖x−c(x)‖², the r16
    * bench recipe; τ₀ = 2 − 2·cosThreshold for near-unit vectors)? It
    * models quantization error as orthogonal AND independent across
    * the pair. For ADC that holds well (the candidate is the only
    * quantized side) and the boundary measurement reproduces ~τ₀+bias.
    * For SDC it fails in exactly the regime dedup cares about:
    * STRADDLER pairs are near-identical, their sub-vectors mostly
    * quantize to the SAME codes, the two errors correlate, and the
    * code-to-code distance collapses far below the "both biases" model
    * — the ×2 fold-in over-dedups massively (measured in PqSpec's
    * seeded case: τ₀+2·bias kept 110 where the exact regime kept 200;
    * the boundary-measured τ recovers the exact count on both modes).
    * Error correlation is a property of the pair geometry; only
    * measuring AT the boundary captures it.
    *
    * The sample must be codebook-representative (the natural choice is
    * the codebook's own training sample); it is bounded to the first
    * `sampleN` rows by `idCol` — deterministic TakeOrdered collect,
    * the same driver-bounded class as [[train]]'s sample (the partner
    * construction is per-row arithmetic; scoring runs distributed
    * through the kernels). Zero-norm vectors and vectors with no
    * orthogonal residual (constant vectors) are skipped; null scores
    * (corrupt rows, per the kernel null contract) are excluded from
    * the mean.
    *
    * Spec'd in PqSpec: a LOSSLESS codebook (every sub-vector its own
    * sub-centroid) reproduces the pure cos→L2 map exactly — τ =
    * 2 − 2·cosThreshold for unit vectors — and on a seeded near-dup
    * corpus the calibrated τ recovers the exact-regime kept-count in
    * BOTH modes (the agreement class the r16 ingest artifact measured
    * at 1M rows).
    */
  def calibrateTauDist(sample: DataFrame, idCol: String, vecCol: String,
      cb: Codebook, cosThreshold: Double, mode: String = "adc",
      sampleN: Int = 20000): Double = {
    require(mode == "adc" || mode == "sdc",
      s"""calibrateTauDist: mode must be "adc" or "sdc" (got "$mode")""")
    val (adc, sdc) = calibrateTauDists(sample, idCol, vecCol, cb,
      cosThreshold, sampleN, wantAdc = mode == "adc",
      wantSdc = mode == "sdc")
    if (mode == "adc") adc else sdc
  }

  /** BOTH modes' τ from ONE sample collect and ONE boundary-score pass
    * — the hybrid callers' form ([[semanticDedupFlagsPqHybrid]] needs
    * τ_sdc AND τ_adc over the same calibration sample; two
    * [[calibrateTauDist]] calls pay the TakeOrdered collect, the
    * partner synthesis, and the distributed scoring job twice for
    * byte-identical inputs). Each τ is exactly what the single-mode
    * call returns: same sample order, same pair construction, same
    * kernel expressions — the two means just share one aggregate.
    * Returns (τ_adc, τ_sdc).
    */
  def calibrateTauDistBoth(sample: DataFrame, idCol: String,
      vecCol: String, cb: Codebook, cosThreshold: Double,
      sampleN: Int = 20000): (Double, Double) =
    calibrateTauDists(sample, idCol, vecCol, cb, cosThreshold, sampleN,
      wantAdc = true, wantSdc = true)

  private def calibrateTauDists(sample: DataFrame, idCol: String,
      vecCol: String, cb: Codebook, cosThreshold: Double, sampleN: Int,
      wantAdc: Boolean, wantSdc: Boolean): (Double, Double) = {
    require(sampleN > 0, "calibrateTauDist: sampleN must be positive")
    require(cosThreshold > -1.0 && cosThreshold <= 1.0,
      s"calibrateTauDist: cosThreshold must be in (-1, 1] " +
        s"(got $cosThreshold)")
    val spark = sample.sparkSession
    val rows = sample.orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .limit(sampleN).collect()
      .flatMap(r => Option(r.getSeq[Double](0)))
      .filter(v => v.forall(x => !x.isNaN))
    require(rows.nonEmpty, "calibrateTauDist: empty calibration sample")
    val cosT = cosThreshold
    val sinT = math.sqrt(math.max(0.0, 1.0 - cosT * cosT))
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    val pairs = rows.toSeq.flatMap { x =>
      val n = norm(x)
      if (n < 1e-12) None
      else {
        val xh = x.map(_ / n)
        // deterministic direction "unrelated" to x: its own coordinate
        // rotation, Gram-Schmidt'ed orthogonal to x
        val shifted = xh.last +: xh.init
        val proj = shifted.zip(xh).map { case (s, h) => s * h }.sum
        val resid = shifted.zip(xh).map { case (s, h) => s - proj * h }
        val rn = norm(resid)
        if (rn < 1e-9) None // constant vector: no orthogonal residual
        else {
          val u = resid.map(_ / rn)
          // same-norm partner at exactly cos = cosT
          Some((x, xh.zip(u).map { case (h, uu) =>
            n * (cosT * h + sinT * uu) }))
        }
      }
    }
    require(pairs.nonEmpty,
      "calibrateTauDist: no usable vectors in the sample (all " +
        "zero-norm or constant) — cannot calibrate a threshold")
    import spark.implicits._
    val df = pairs.toDF("x", "xp")
    val cbCol = cbLit(cb)
    val adcScore = GraftFunctions.pq_adc(
      GraftFunctions.pq_lut(col("x"), cbCol, cb.m, cb.k),
      GraftFunctions.pq_encode(col("xp"), cbCol, cb.m, cb.k))
    def sdcScore = GraftFunctions.pq_sdc(
      GraftFunctions.pq_encode(col("x"), cbCol, cb.m, cb.k),
      GraftFunctions.pq_encode(col("xp"), cbCol, cb.m, cb.k),
      sdcTable(cb), cb.k)
    val scores = (if (wantAdc) Seq(adcScore.as("_adc")) else Seq.empty) ++
      (if (wantSdc) Seq(sdcScore.as("_sdc")) else Seq.empty)
    // every requested mode's boundary mean in ONE distributed pass
    val aggRow = df.select(scores: _*).agg(
      (if (wantAdc) avg(col("_adc")) else min(lit(Double.NaN))).as("_ma"),
      (if (wantSdc) avg(col("_sdc")) else min(lit(Double.NaN))).as("_ms"))
      .head
    def checked(i: Int): Double = {
      require(!aggRow.isNullAt(i),
        "calibrateTauDist: no non-null boundary distances in the " +
          "sample — an all-corrupt sample cannot calibrate a threshold")
      aggRow.getDouble(i)
    }
    (if (wantAdc) checked(0) else Double.NaN,
      if (wantSdc) checked(1) else Double.NaN)
  }

  /** Per-metric pieces: LUT builder, output score column, rank order.
    * "l2" ranks ascending squared distance (column `adc_dist`); "ip"
    * ranks DESCENDING inner product (column `adc_ip`). MEASURED
    * guidance (PQ_*_r11.json): for cosine over a unit-norm corpus,
    * "l2" wins — its −‖c(x)‖²/2 term implicitly corrects the
    * MSE-codebook reconstruction bias that raw IP-ADC keeps
    * (see [[graft.functions.PqKernels.lutIp]]); "ip" is for true MIPS
    * over deliberately un-normalized corpora.
    */
  private def metricPieces(metric: String, cb: Codebook,
      vec: Column): (Column, String, Column => Column) = metric match {
    // nulls LAST under both orders: a corrupt embedding (null element ⇒
    // null code ⇒ null ADC, the kernels' documented contract) must
    // never occupy a top-k rank. Spark's bare .asc is NULLS FIRST —
    // under it one corrupt corpus row would rank #1 in EVERY query's
    // l2 top-k (ip's .desc is nulls-last by default; made explicit so
    // the symmetry is visible).
    case "l2" => (GraftFunctions.pq_lut(vec, cbLit(cb), cb.m, cb.k),
      "adc_dist", c => c.asc_nulls_last)
    case "ip" => (GraftFunctions.pq_lut_ip(vec, cbLit(cb), cb.m, cb.k),
      "adc_ip", c => c.desc_nulls_last)
    case other => throw new IllegalArgumentException(
      s"""PQ metric must be "l2" or "ip" (got "$other")""")
  }

  /** The shared rank stage of the PQ search surfaces: top-k per `qid`
    * on (score best-first, id asc) over NULL-FREE scored rows — both
    * callers filter null ADC scores before ranking, so the bounded
    * aggregates never see one. Window-free whenever k and the id/cell
    * types allow, mirroring [[graft.ops.Similarity.ivfSearchBatch]]:
    * k=1 collapses to a `min_by` partial aggregate, 1<k≤MaxK to the
    * bounded [[graft.functions.TopKByScore]] buffer (≤ k hits per
    * query leave each map partition instead of every ADC-scored
    * candidate — on the brute [[searchBatch]] the window would shuffle
    * |batch|·|corpus| rows), anything else keeps the rank window.
    *
    * `biggerIsBetter` encodes the metric ("ip" ranks descending, "l2"
    * ascending): internally everything ranks on a bigger-is-better
    * goodness, built as `0.0 - score` for "l2" so a −0.0 score can't
    * order-split a tie, and un-negated exactly on the way out
    * (0−(0−x) ≡ x for every finite x; ADC l2 scores are ≥ 0).
    * `cellCol` rides through the payload when the caller carries one.
    */
  private def rankTopK(scored: DataFrame, idCol: String, scoreCol: String,
      biggerIsBetter: Boolean, k: Int, cellCol: Option[String])
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TopKByScore
    def integral(dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val goodness =
      if (biggerIsBetter) col(scoreCol) else lit(0.0) - col(scoreCol)
    val idType = scored.schema(idCol).dataType
    val cellType = cellCol.map(c => scored.schema(c).dataType)
    val outCols = Seq(idCol) ++ cellCol ++ Seq(scoreCol)
    if (k == 1)
      scored.groupBy(col("qid"))
        .agg(min_by(struct(outCols.map(col): _*),
          struct(lit(0.0) - goodness, col(idCol))).as("_t"))
        .select(col("qid") +: outCols.map(n => col(s"_t.$n")): _*)
    else if (k <= TopKByScore.MaxK && integral(idType) &&
        cellType.forall(integral))
      scored.groupBy(col("qid"))
        .agg(TopKByScore.topk(k, col(idCol).cast("long"),
          cellCol.map(col).getOrElse(lit(0L)).cast("long"),
          goodness).as("_t"))
        .select(col("qid"), explode(col("_t")).as("_e"))
        .select(col("qid") +: (
          Seq(col("_e.id").cast(idType).as(idCol)) ++
          cellCol.map(c => col("_e.cell").cast(cellType.get).as(c)) ++
          Seq((if (biggerIsBetter) col("_e.cos_sim")
            else lit(0.0) - col("_e.cos_sim")).as(scoreCol))): _*)
    else {
      val ord = if (biggerIsBetter) col(scoreCol).desc_nulls_last
        else col(scoreCol).asc_nulls_last
      scored
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("qid")).orderBy(ord, col(idCol).asc)))
        .filter(col("_rn") <= k)
        .drop("_rn")
    }
  }

  /** Append a `pq_code` column (array<int> of length m) — the encode
    * pass: one native-kernel scan, zero shuffle, the corpus-scale step
    * that replaces 512-byte vectors with m-byte codes.
    */
  def encode(df: DataFrame, vecCol: String, cb: Codebook): DataFrame =
    df.withColumn("pq_code",
      GraftFunctions.pq_encode(col(vecCol), cbLit(cb), cb.m, cb.k))

  /** Brute-force ADC batch search over a CODES table — the
    * whole-corpus rescore baseline (the scale path is
    * [[ivfPqSearchBatch]], which prunes to probed cells first). Each
    * query row computes its m·k LUT once (native kernel), the query
    * batch broadcasts against the code scan — the deliberate
    * broadcast-crossJoin form every brute baseline here uses
    * ([[Similarity.knnCosine]]'s shape): candidate work is
    * |batch|·|corpus| ADC lookups, which is the POINT of ADC — m table
    * reads per candidate instead of d multiplies.
    *
    * Returns (qid, `idCol`, score) — top `k` per query, ranked on the
    * ROUNDED score with id tie-break (the determinism rule every ANN
    * surface here shares). The score column is metric-dependent:
    * `adc_dist` ascending under "l2", `adc_ip` descending under "ip".
    * Null-scored rows (corrupt vectors, per the kernel null contract)
    * are excluded, never ranked. `queryIdCol` must be unique within
    * `queries` (same window contract as [[Similarity.ivfSearchBatch]]).
    */
  def searchBatch(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, codes: DataFrame, idCol: String,
      cb: Codebook, k: Int, excludeSelf: Boolean = true,
      metric: String = "l2"): DataFrame = {
    val (lut, scoreCol, _) = metricPieces(metric, cb, col(queryVecCol))
    val q = queries.select(col(queryIdCol).as("qid"), lut.as("_lut"))
    val cand = codes.crossJoin(broadcast(q))
    val scoped =
      if (excludeSelf) cand.filter(col(idCol) =!= col("qid")) else cand
    val scored = scoped
      .select(col("qid"), col(idCol),
        round(GraftFunctions.pq_adc(col("_lut"), col("pq_code")), 5)
          .as(scoreCol))
      // a null score (corrupt row or corrupt query, per the kernel
      // null contract) is not a rankable result — excluded, not ranked
      .filter(col(scoreCol).isNotNull)
    // window-free rank whenever possible matters MOST here: the brute
    // cross join scores |batch|·|corpus| rows, and a rank window would
    // shuffle every one of them
    rankTopK(scored, idCol, scoreCol, biggerIsBetter = metric == "ip",
      k, cellCol = None)
  }

  /** The pair identity of an IVF-PQ layout: both codebooks, one stamp
    * (graft-wide: the streaming PQ ingest stamps its tree with it too).
    */
  private[graft] def combinedStamp(ivfStamp: String, cb: Codebook): String =
    s"$ivfStamp+${cb.stamp}"

  /** Build AND persist an IVF-PQ index: cell-partitioned like
    * [[Similarity.ivfIndexWrite]], but each row stores its PQ code and
    * NOT the vector — the layout whose probed-cell scan reads m bytes
    * per candidate instead of the embedding payload. The `_params`
    * stamp (and O(1) sidecar) covers BOTH codebooks: a probe under a
    * different IVF codebook mis-routes, a probe under a different PQ
    * codebook mis-scores, and either must fail loudly, not
    * approximately.
    *
    * Exact re-ranking needs the original vectors; fetch them by id
    * from the SOURCE table for the top candidates only
    * ([[ivfPqSearchRefined]]) — that join is k·|batch| rows, not the
    * corpus.
    */
  /** Assign + encode + stamp over a pre-collected codebook — the one
    * canonical derivation every writer below shares (one centroid
    * collect per build, not one per call layer).
    */
  private def frameFrom(emb: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double])], cb: Codebook)
  : (DataFrame, String) = {
    val stamp = combinedStamp(Similarity.codebookStamp(cents), cb)
    (encode(Similarity.ivfAssignLocal(emb, vecCol, cents), vecCol, cb)
      .select(col(idCol), col("pq_code"), col("cell"))
      .withColumn("_params", lit(stamp)), stamp)
  }

  /** The stamped IVF-PQ index FRAME [[ivfPqIndexWrite]] persists —
    * exposed so alternative writers (a streaming exactly-once build
    * via [[graft.streaming.IdempotentSink.indexByBatch]], a job that
    * embeds the write in a larger plan) produce the identical rows.
    */
  def ivfPqIndexFrame(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook): DataFrame =
    frameFrom(emb, idCol, vecCol, Similarity.collectCodebook(centroids,
      centroidIdCol, centroidVecCol), cb)._1

  def ivfPqIndexWrite(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, indexDir: String): Unit =
    ivfPqIndexWriteFrom(emb, idCol, vecCol,
      Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, indexDir)

  /** [[ivfPqIndexWrite]] over a PRE-COLLECTED codebook — a query body
    * that builds the index and probes it under the same centroids
    * threads ONE collect through both (r19, extending r18's `*From`
    * threading).
    */
  private[graft] def ivfPqIndexWriteFrom(emb: DataFrame, idCol: String,
      vecCol: String, cents: Seq[(Long, Seq[Double])], cb: Codebook,
      indexDir: String): Unit = {
    val (frame, stamp) = frameFrom(emb, idCol, vecCol, cents, cb)
    frame.write.partitionBy("cell").mode("overwrite").parquet(indexDir)
    Similarity.writeStampSidecar(emb.sparkSession, indexDir, stamp)
  }

  /** Build the IVF-PQ code tree AND its refine companion — the
    * cell-partitioned FULL-VECTOR layout ([[Similarity.ivfIndexWrite]]'s
    * tree) — in one pass over the corpus: the vector tree is written
    * first (the only `emb` scan — one assignment fold), and the code
    * tree derives from the PERSISTED vectors, whose `cell` is already
    * assigned, so encoding is a pure kernel scan of the vector tree
    * with zero re-assignment work. The two trees agree row-for-row by
    * construction (same assignment, same commit), and each carries its
    * own sidecar stamp so [[ivfPqSearchRefined]] can verify BOTH before
    * probing.
    *
    * This is the storage contract of the memory tier spelled out: the
    * small hot code tree serves every probe; the big cold vector tree
    * is touched only by the refine tail's cell-pruned fetch.
    */
  def ivfPqIndexWritePair(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, indexDir: String, vectorsDir: String): Unit =
    ivfPqIndexWritePairFrom(emb, idCol, vecCol,
      Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, indexDir, vectorsDir)

  /** [[ivfPqIndexWritePair]] over a PRE-COLLECTED codebook — a query
    * body that pair-builds and then probes threads ONE collect through
    * build and probe (r19).
    */
  private[graft] def ivfPqIndexWritePairFrom(emb: DataFrame,
      idCol: String, vecCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, indexDir: String, vectorsDir: String): Unit = {
    val spark = emb.sparkSession
    // one centroid collect for the whole pair build: the vector-tree
    // write threads the same collected codebook the stamp uses (r18)
    Similarity.ivfIndexWriteFrom(emb, vecCol, cents, vectorsDir)
    val stamp = combinedStamp(Similarity.codebookStamp(cents), cb)
    encode(spark.read.parquet(vectorsDir), vecCol, cb)
      .select(col(idCol), col("pq_code"), col("cell"))
      .withColumn("_params", lit(stamp))
      .write.partitionBy("cell").mode("overwrite").parquet(indexDir)
    Similarity.writeStampSidecar(spark, indexDir, stamp)
  }

  /** [[Similarity.rebuildUnderCodebook]] for an IVF-PQ refine PAIR:
    * one pass over the old FULL-VECTOR tree re-assigning and
    * re-encoding under the new IVF codebook AND new PQ codebook, out
    * to a fresh pair via [[ivfPqIndexWritePair]] (vector tree written
    * first, code tree derived from the persisted vectors — the trees
    * agree row-for-row by construction). The managed path out of the
    * combined-stamp refusal: re-clustering OR re-training invalidates
    * the pair, and both are the same migration.
    *
    * The source must be the pair's VECTOR tree (or any tree carrying
    * `idCol`+`vecCol`): codes cannot re-encode — quantization already
    * destroyed the residual a new codebook would need; the vector twin
    * is exactly the "decode side" this migration exists to read. Its
    * own stamp is irrelevant (re-assignment reads vectors only).
    *
    * Same crash contract as the scalar variant, pairwise: both
    * sidecars are written after their data, both writes are
    * overwrite-mode, so a crash anywhere re-runs to convergence; a
    * finished migration (both sidecars matching) no-ops; a COMPLETE
    * foreign layout at either new root refuses. Cut readers over only
    * after this returns. A pending compaction swap at the old root
    * refuses for the same drop-their-rows reason. Returns the
    * combined stamp.
    */
  def rebuildPairUnderCodebooks(spark: SparkSession,
      oldVectorsRoot: String, idCol: String, vecCol: String,
      newCentroids: DataFrame, centroidIdCol: String,
      centroidVecCol: String, cb: Codebook,
      newIndexDir: String, newVectorsDir: String): String = {
    require(newIndexDir != oldVectorsRoot &&
      newVectorsDir != oldVectorsRoot && newIndexDir != newVectorsDir,
      "rebuildPairUnderCodebooks: the three roots must be distinct — " +
        "in-place migration is impossible by design")
    val cents = Similarity.collectCodebook(newCentroids, centroidIdCol,
      centroidVecCol)
    val ivfStamp = Similarity.codebookStamp(cents)
    val pairStamp = combinedStamp(ivfStamp, cb)
    val root = new org.apache.hadoop.fs.Path(oldVectorsRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val pendingManifest = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        root.getParent, root.getName + "_compact_tmp"),
      graft.streaming.IdempotentSink.FoldManifest)
    if (fs.exists(pendingManifest))
      throw new IllegalStateException(
        s"rebuildPairUnderCodebooks: $oldVectorsRoot has a pending " +
          "compaction swap — finish it first (some cells' only copy " +
          "is in the temp tree; rebuilding now would drop their rows)")
    require(graft.io.FsUtil.hasDataFiles(fs, root),
      s"rebuildPairUnderCodebooks: no data files under $oldVectorsRoot")
    val sidecars = (Similarity.readStampSidecar(spark, newVectorsDir),
      Similarity.readStampSidecar(spark, newIndexDir))
    if (sidecars == ((Some(ivfStamp), Some(pairStamp)))) {
      System.err.println("[graft] rebuildPairUnderCodebooks: both new " +
        s"roots already carry this migration's stamps ($pairStamp) — " +
        "nothing to do")
      return pairStamp
    }
    Seq(newVectorsDir -> sidecars._1 -> ivfStamp,
      newIndexDir -> sidecars._2 -> pairStamp).foreach {
      case ((dir, Some(s)), expect) if s != expect =>
        throw new IllegalStateException(
          s"rebuildPairUnderCodebooks: $dir already holds a COMPLETE " +
            s"layout under different codebooks (sidecar $s, this " +
            s"migration targets $expect) — refusing to overwrite it")
      case _ => // absent (fresh or crashed-partial: overwrite) or match
    }
    ivfPqIndexWritePair(
      spark.read.parquet(oldVectorsRoot).select(col(idCol), col(vecCol)),
      idCol, vecCol, newCentroids, centroidIdCol, centroidVecCol, cb,
      newIndexDir, newVectorsDir)
    pairStamp
  }

  /** Incremental append to a persisted [[ivfPqIndexWrite]] layout —
    * the micro-batch ingest path of the memory tier, mirroring
    * [[Similarity.ivfIndexAppend]]: new vectors are assigned AND
    * encoded under the layout's exact (stamped) codebooks, their
    * (id, code, cell) rows appended to the matching cell directories;
    * the existing index is never read beyond the O(1) stamp check and
    * never rewritten. A mismatched IVF codebook OR PQ codebook refuses
    * BEFORE any write (the combined stamp covers both). Fragmentation
    * from an append loop is the same cell-directory problem as the
    * plain IVF index, and [[Similarity.compactCells]] is
    * layout-agnostic — it moves rows by cell directory regardless of
    * which columns ride along — so the identical compaction pass
    * applies (spec-proven on an IVF-PQ layout).
    *
    * For a layout with a refine companion ([[ivfPqIndexWritePair]]),
    * use [[ivfPqIndexAppendPair]] instead: appending the code tree
    * alone desyncs the pair — the stamps stay valid, the appended ids
    * become candidates, and the refine fetch drops them silently
    * (caught loudly by [[ivfPqSearchRefined]]'s pair-sync guard, but
    * the repair is the paired append).
    */
  def ivfPqIndexAppend(newVectors: DataFrame, idCol: String,
      vecCol: String, indexDir: String, centroids: DataFrame,
      centroidIdCol: String, centroidVecCol: String, cb: Codebook)
  : Unit = {
    require(newVectors.columns.contains(idCol) &&
      newVectors.columns.contains(vecCol),
      s"ivfPqIndexAppend: newVectors needs columns '$idCol' and " +
        s"'$vecCol' (has ${newVectors.columns.mkString(", ")})")
    val (assigned, stamp) = frameFrom(newVectors, idCol, vecCol,
      Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb)
    Similarity.appendToStampedLayout(assigned, indexDir, stamp,
      "ivfPqIndexAppend")
  }

  /** Append to BOTH trees of an [[ivfPqIndexWritePair]] layout in one
    * call — the ingest path that keeps the refine pair in sync.
    * Appending to the code tree alone ([[ivfPqIndexAppend]]) leaves the
    * vector tree without the new rows: both stamps still verify (the
    * codebooks are unchanged), the probe surfaces the appended ids as
    * candidates, and the refine fetch silently drops them — recall
    * degrades with no error. This call assigns the batch ONCE
    * (batch-sized checkpoint) and appends the full vectors and the PQ
    * codes from the same assignment, so the trees keep agreeing
    * row-for-row.
    *
    * Crash contract: the VECTOR tree appends first. A crash between the
    * two appends leaves vectors-ahead — the appended rows are simply
    * not yet probe-visible (the same state as a not-yet-ingested
    * batch), never the silent-drop state; [[ivfPqSearchRefined]]'s
    * pair-sync guard additionally refuses any probe whose candidate
    * cells disagree between the trees, so the half-appended state is
    * repaired (re-run the pair append after restoring agreement — e.g.
    * re-write the pair), not silently served. Both trees' stamps are
    * verified BEFORE either write.
    */
  def ivfPqIndexAppendPair(newVectors: DataFrame, idCol: String,
      vecCol: String, indexDir: String, vectorsDir: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook): Unit = {
    require(newVectors.columns.contains(idCol) &&
      newVectors.columns.contains(vecCol),
      s"ivfPqIndexAppendPair: newVectors needs columns '$idCol' and " +
        s"'$vecCol' (has ${newVectors.columns.mkString(", ")})")
    val spark = newVectors.sparkSession
    val cents = Similarity.collectCodebook(centroids, centroidIdCol,
      centroidVecCol)
    val ivfStamp = Similarity.codebookStamp(cents)
    val pairStamp = combinedStamp(ivfStamp, cb)
    // verify BOTH trees before either write: failing the second append
    // after the first committed would manufacture the very desync this
    // call exists to prevent
    Similarity.verifyStamp(spark.read.parquet(vectorsDir), ivfStamp,
      "ivfPqIndexAppendPair",
      desc = "vector tree assigned under a different codebook"): Unit
    Similarity.verifyStamp(spark.read.parquet(indexDir), pairStamp,
      "ivfPqIndexAppendPair",
      desc = "code tree built under different codebooks"): Unit
    // one assignment for both trees — batch-sized, checkpointed so the
    // two appends don't re-run the distance fold
    val assigned = Similarity.ivfAssignLocal(
      newVectors.select(col(idCol), col(vecCol)), vecCol, cents)
      .localCheckpoint(false)
    Similarity.appendToStampedLayout(
      assigned.withColumn("_params", lit(ivfStamp)),
      vectorsDir, ivfStamp, "ivfPqIndexAppendPair",
      desc = "vector tree assigned under a different codebook")
    Similarity.appendToStampedLayout(
      encode(assigned, vecCol, cb)
        .select(col(idCol), col("pq_code"), col("cell"))
        .withColumn("_params", lit(pairStamp)),
      indexDir, pairStamp, "ivfPqIndexAppendPair",
      desc = "code tree built under different codebooks")
  }

  /** Batch ANN against a RELOADED IVF-PQ index: probe-cell selection
    * and static `cell IN (...)` partition pruning exactly as
    * [[Similarity.ivfSearchBatch]] (the plan shape with the proven
    * numFiles gate), but candidates are scored by ADC — the probed
    * cells' scan reads (id, pq_code) only, never a vector column.
    * Returns (qid, `idCol`, cell, score), top `k` per query on the
    * rounded score with id tie-break — the score column is
    * metric-dependent (`adc_dist` asc under "l2", `adc_ip` desc under
    * "ip"); null-scored rows are excluded, never ranked.
    *
    * BATCH-SIZE CONTRACT: besides `queryIdCol` uniqueness (same window
    * contract as [[Similarity.ivfSearchBatch]]), the query batch must
    * be broadcast-sized — the probe ships every query's m·k-double LUT
    * to the executors (m=16, k=256 ⇒ 32 KB/query; 10⁴ queries ⇒
    * ~320 MB, about the practical broadcast ceiling; 10⁵ ⇒ ~3 GB,
    * past it). The plan already avoids the nProbe× LUT blowup by
    * keeping probe pairs and LUTs separate (below); for batches past
    * ~10⁴ queries use [[ivfPqSearchBatchChunked]], which splits the
    * batch driver-side and unions per-chunk results — result-identical
    * (each query's top-k depends on no other query; spec'd in PqSpec).
    */
  def ivfPqSearchBatch(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, index: DataFrame, idCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true, metric: String = "l2",
      superCells: Int = 0, superProbe: Int = 0): DataFrame =
    ivfPqSearchBatchFrom(queries, queryIdCol, queryVecCol, index, idCol,
      Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, k, nProbe, excludeSelf, metric, superCells,
      superProbe)

  /** [[ivfPqSearchBatch]] over a PRE-COLLECTED codebook — the form the
    * chunked wrappers and the streaming ingest thread their one
    * centroid collect through (the DataFrame entry point re-collected
    * the centroids per call: one extra job per chunk/layer; r18).
    */
  private[graft] def ivfPqSearchBatchFrom(queries: DataFrame,
      queryIdCol: String, queryVecCol: String, index: DataFrame,
      idCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true, metric: String = "l2",
      superCells: Int = 0, superProbe: Int = 0): DataFrame = {
    val checked = Similarity.verifyStamp(index,
      combinedStamp(Similarity.codebookStamp(cents), cb),
      "ivfPqSearchBatch")
    // cell selection stays L2 against the IVF centroids regardless of
    // metric — cells ARE L2-nearest regions of that codebook
    val (lut, scoreCol, _) = metricPieces(metric, cb, col("qvec"))
    val codebook = typedLit(cents)
    val q = queries.select(col(queryIdCol).as("qid"),
      col(queryVecCol).cast("array<double>").as("qvec"))
    // (qid, cell) probe pairs and (qid, LUT) kept SEPARATE: computing
    // the m·k-double LUT on the exploded probe rows would materialize
    // (and broadcast) nProbe copies of every query's table — at m=8,
    // k=256, nProbe=8 that is 8×16 KB per query instead of 16 KB.
    // Probe selection itself is the shared window-free bounded-agg
    // stage (batch × |codebook| rows never cross an exchange whole);
    // superProbe > 0 opts into the COARSE tier for √n-scale codebooks
    // (O(s + superProbe·k/s) distance rows per query instead of O(k) —
    // [[Similarity.probeCellsHierarchical]]'s approximation contract)
    val qcells = (if (superProbe > 0)
      Similarity.probeCellsHierarchical(q, cents, nProbe, superCells,
        superProbe)
    else Similarity.probeTopCells(q
      .select(col("qid"), col("qvec"), explode(codebook).as("c"))
      .select(col("qid"), col("c._1").as("cell"),
        GraftFunctions.vec_sqdist(col("qvec"), col("c._2")).as("d")),
      nProbe))
      .localCheckpoint(true) // probe side computed once: collect + join
    val qluts = q.select(col("qid"), lut.as("_lut"))
    val probedCells = qcells.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val cand = checked.filter(col("cell").isin(probedCells: _*))
      .join(broadcast(qcells), Seq("cell"))
      .join(broadcast(qluts), Seq("qid"))
    val scoped =
      if (excludeSelf) cand.filter(col(idCol) =!= col("qid")) else cand
    val scored = scoped
      .select(col("qid"), col(idCol), col("cell"),
        round(GraftFunctions.pq_adc(col("_lut"), col("pq_code")), 5)
          .as(scoreCol))
      // null score (corrupt row/query) = not a rankable result
      .filter(col(scoreCol).isNotNull)
    rankTopK(scored, idCol, scoreCol, biggerIsBetter = metric == "ip",
      k, cellCol = Some("cell"))
  }

  /** The SDC code-to-code distance table for `cb`, flattened
    * subspace-major: `table[(j·k + a)·k + b] = ‖c_{j,a} − c_{j,b}‖²`
    * (m·k² doubles — m=8, k=256 ⇒ 4 MB, a PLAN CONSTANT shared by
    * every query in every batch, vs ADC's per-query m·k-double LUT).
    * Driver-side m·k²·dsub flops, trivial at codebook scale.
    */
  def sdcTable(cb: Codebook): IndexedSeq[Double] = {
    val (m, k, dsub) = (cb.m, cb.k, cb.dsub)
    val out = new Array[Double](m * k * k)
    var j = 0
    while (j < m) {
      var a = 0
      while (a < k) {
        var b = 0
        while (b < k) {
          var s = 0.0
          var t = 0
          while (t < dsub) {
            val d0 = cb.flat((j * k + a) * dsub + t) -
              cb.flat((j * k + b) * dsub + t)
            s += d0 * d0
            t += 1
          }
          out((j * k + a) * k + b) = s
          b += 1
        }
        a += 1
      }
      j += 1
    }
    out.toIndexedSeq
  }

  /** [[ivfPqSearchBatch]] with SYMMETRIC distance (SDC): the query
    * side is ENCODED too, and candidates score through the shared
    * m·k² [[sdcTable]] instead of per-query LUTs. Same probe-cell
    * selection (L2 against the IVF centroids — exact query vectors,
    * cells are unaffected), same window-free rank stage, same
    * determinism (rounded score, id tie-break), same null contract
    * (a corrupt vector encodes to a null code and is excluded, never
    * ranked). Returns (qid, `idCol`, cell, sdc_dist) — ascending.
    *
    * REGIME (measured, SDC_1m_r17.json): ADC ships m·k doubles PER
    * QUERY (16 KB at m=8/k=256 — 32× a dim-64 vector; a 10⁴-query
    * batch is a ~160 MB broadcast whose per-candidate hash-probes
    * dominate the probe wall). SDC ships the m-byte query code plus
    * one 4 MB table for the whole plan — use it when the query batch
    * is large relative to the probed candidates (the streaming-ingest
    * shape). The price is the SECOND quantization: the error term
    * gains E‖q−c(q)‖² on top of ADC's E‖x−c(x)‖², roughly doubling
    * the τ-calibration bias and widening the straddler band — both
    * measurable as mean self-distances, executable via
    * [[calibrateTauDist]] (mode "sdc") (PqSpec pins SDC == ADC ==
    * exact on a lossless codebook, so the difference IS the
    * quantization, not the plumbing).
    *
    * BATCH-SIZE CONTRACT: the qcells (|batch|·nProbe rows) and qcodes
    * (|batch| rows) frames still BROADCAST — ~100 bytes per query at
    * m=8/nProbe=2, so the practical ceiling sits around ~10⁶–10⁷
    * queries (vs ADC's ~10⁴): two orders of magnitude more headroom,
    * but NOT unbounded. A corpus-refresh batch past that (the 10⁸-row
    * shape) must go through [[ivfPqSearchBatchSdcChunked]], whose
    * hash chunks bound both broadcasts — same result by construction.
    */
  def ivfPqSearchBatchSdc(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, index: DataFrame, idCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true,
      superCells: Int = 0, superProbe: Int = 0): DataFrame =
    ivfPqSearchBatchSdcFrom(queries, queryIdCol, queryVecCol, index,
      idCol, Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, k, nProbe, excludeSelf, superCells,
      superProbe)

  /** [[ivfPqSearchBatchSdc]] over a PRE-COLLECTED codebook — see
    * [[ivfPqSearchBatchFrom]].
    */
  private[graft] def ivfPqSearchBatchSdcFrom(queries: DataFrame,
      queryIdCol: String, queryVecCol: String, index: DataFrame,
      idCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true,
      superCells: Int = 0, superProbe: Int = 0): DataFrame = {
    val checked = Similarity.verifyStamp(index,
      combinedStamp(Similarity.codebookStamp(cents), cb),
      "ivfPqSearchBatchSdc")
    val codebook = typedLit(cents)
    // the m·k² table rides INSIDE the pq_sdc expression as a primitive
    // double[] constructor constant — as a typedLit child it converted
    // to boxed ArrayData and the per-row pointer chases measured 6×
    // the whole ADC scoring pass (see PqKernels.sdc)
    val table = sdcTable(cb)
    val q = queries.select(col(queryIdCol).as("qid"),
      col(queryVecCol).cast("array<double>").as("qvec"))
    // probe pairs from the EXACT query (cell selection must not pay
    // the second quantization); query codes ride a separate tiny
    // frame; superProbe > 0 opts into the coarse probe tier
    val qcells = (if (superProbe > 0)
      Similarity.probeCellsHierarchical(q, cents, nProbe, superCells,
        superProbe)
    else Similarity.probeTopCells(q
      .select(col("qid"), col("qvec"), explode(codebook).as("c"))
      .select(col("qid"), col("c._1").as("cell"),
        GraftFunctions.vec_sqdist(col("qvec"), col("c._2")).as("d")),
      nProbe))
      .localCheckpoint(true) // probe side computed once: collect + join
    val qcodes = q.select(col("qid"),
      GraftFunctions.pq_encode(col("qvec"), cbLit(cb), cb.m, cb.k)
        .as("_qcode"))
    val probedCells = qcells.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val cand = checked.filter(col("cell").isin(probedCells: _*))
      .join(broadcast(qcells), Seq("cell"))
      .join(broadcast(qcodes), Seq("qid"))
    val scoped =
      if (excludeSelf) cand.filter(col(idCol) =!= col("qid")) else cand
    val scored = scoped
      .select(col("qid"), col(idCol), col("cell"),
        round(GraftFunctions.pq_sdc(col("_qcode"), col("pq_code"),
          table, cb.k), 5).as("sdc_dist"))
      .filter(col("sdc_dist").isNotNull)
    rankTopK(scored, idCol, "sdc_dist", biggerIsBetter = false,
      k, cellCol = Some("cell"))
  }

  /** [[semanticDedupFlagsPq]] through the SYMMETRIC probe — the
    * LARGE-BATCH dedup regime: the batch side ships codes, not LUTs,
    * so a corpus-refresh batch probes without the ADC variant's
    * |batch|·m·k-double broadcast; the probe goes through
    * [[ivfPqSearchBatchSdcChunked]], so batches past the single-shot
    * broadcast ceiling (the 10⁸-row corpus-refresh shape) split into
    * bounded hash chunks automatically. `tauDist` must carry BOTH
    * quantization biases (≈ 2× ADC's — [[calibrateTauDist]] with mode
    * "sdc" computes it). Returns
    * (batchIdCol, neighbor_id, sdc_dist, keep).
    */
  def semanticDedupFlagsPqSdc(batch: DataFrame, batchIdCol: String,
      batchVecCol: String, index: DataFrame, idCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, tauDist: Double, nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame =
    semanticDedupFlagsPqSdcFrom(batch, batchIdCol, batchVecCol, index,
      idCol, Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, tauDist, nProbe, excludeSelf)

  /** [[semanticDedupFlagsPqSdc]] over a PRE-COLLECTED codebook — the
    * streaming ingest's entry point (it already holds the collected
    * centroids for its stamp check; r18).
    */
  private[graft] def semanticDedupFlagsPqSdcFrom(batch: DataFrame,
      batchIdCol: String, batchVecCol: String, index: DataFrame,
      idCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, tauDist: Double, nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    val top = ivfPqSearchBatchSdcChunkedFrom(batch, batchIdCol,
      batchVecCol, index, idCol, cents, cb,
      k = 1, nProbe = nProbe, excludeSelf = excludeSelf)
      .select(col("qid"), col(idCol).as("neighbor_id"), col("sdc_dist"))
    batch.select(col(batchIdCol))
      .join(top, col(batchIdCol) === col("qid"), "left")
      .select(col(batchIdCol), col("neighbor_id"), col("sdc_dist"),
        (col("sdc_dist").isNull || col("sdc_dist") > tauDist).as("keep"))
  }

  /** HYBRID semantic dedup — SDC speed with ADC accuracy exactly where
    * accuracy matters: the whole batch probes through the SYMMETRIC
    * kernel (m-byte codes, the measured 3–6× large-batch win,
    * SDC_1m_r17.json), and ONLY the queries whose best symmetric
    * distance lands inside `band` of `tauSdc` — the STRADDLERS, the
    * population where SDC's doubled quantization actually flips flags
    * (measured ~13% of planted near-dups on the worst-case corpus,
    * SEMINGEST_PQ_SDC_1m_f10_r17, vs ADC's ~1.5%) — get their top
    * `refineK` SDC candidates re-scored by ADC and re-flagged at
    * `tauAdc`. Out-of-band queries keep the SDC verdict untouched.
    *
    * Cost shape: the ADC machinery (per-query m·k-double LUT + the
    * pruned candidate fetch) runs over the BAND-SIZED query subset
    * only — the LUT broadcast is bounded by the straddler count, not
    * the batch, so the contract scales with how thin the boundary is,
    * which the caller controls via `band` (≈ the spread of boundary
    * distances; 0 degenerates to pure SDC, and band = ∞ with refineK ≥
    * candidates degenerates to the pure-ADC verdict — both pinned in
    * PqSpec). Calibrate BOTH thresholds with [[calibrateTauDist]] in
    * the matching mode.
    *
    * Returns (batchIdCol, neighbor_id, sdc_dist, keep) — neighbor
    * attribution stays the SDC top-1 (the cheap pass's answer); `keep`
    * is the hybrid verdict. Null scores keep, as everywhere.
    */
  def semanticDedupFlagsPqHybrid(batch: DataFrame, batchIdCol: String,
      batchVecCol: String, index: DataFrame, idCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, tauSdc: Double, tauAdc: Double, band: Double,
      refineK: Int = 4, nProbe: Int = 2, excludeSelf: Boolean = true)
  : DataFrame =
    semanticDedupFlagsPqHybridFrom(batch, batchIdCol, batchVecCol,
      index, idCol, Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, tauSdc, tauAdc, band, refineK, nProbe,
      excludeSelf)

  /** [[semanticDedupFlagsPqHybrid]] over a PRE-COLLECTED codebook —
    * one centroid collect feeds the SDC pass, the straddler rescore,
    * and the caller's stamp check (r18).
    */
  private[graft] def semanticDedupFlagsPqHybridFrom(batch: DataFrame,
      batchIdCol: String, batchVecCol: String, index: DataFrame,
      idCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, tauSdc: Double, tauAdc: Double, band: Double,
      refineK: Int = 4, nProbe: Int = 2, excludeSelf: Boolean = true)
  : DataFrame = {
    require(band >= 0, "band must be ≥ 0")
    require(refineK >= 1, "refineK must be ≥ 1")
    // one symmetric probe, top-refineK per query — candidate-sized
    // (refineK·|batch| rows), checkpointed: it feeds the best-agg, the
    // straddler join, and (through it) the cell collect
    val top = ivfPqSearchBatchSdcChunkedFrom(batch, batchIdCol,
      batchVecCol, index, idCol, cents, cb,
      k = refineK, nProbe = nProbe, excludeSelf = excludeSelf)
      .localCheckpoint(true)
    // SDC top-1 = rank 1 of the top-K (same (dist asc, id asc) order)
    val best = top.groupBy(col("qid"))
      .agg(min_by(struct(col(idCol), col("sdc_dist")),
        struct(col("sdc_dist"), col(idCol))).as("_t"))
      .select(col("qid"), col(s"_t.$idCol").as("neighbor_id"),
        col("_t.sdc_dist").as("sdc_dist"))
      .localCheckpoint(true) // feeds the band filter AND the final join
    val bandQids = best
      .filter(abs(col("sdc_dist") - lit(tauSdc)) <= lit(band))
      .select(col("qid"))
    // straddler candidate pairs, with the probe's cell riding along so
    // the code fetch prunes to exactly their cells' directories
    val straddlers = top.join(broadcast(bandQids), Seq("qid"))
      .select(col("qid"), col(idCol), col("cell"))
      .localCheckpoint(true) // feeds the cell collect + the code join
    val cells = straddlers.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val rescored = if (cells.isEmpty) {
      // no straddlers: nothing to refine (still produce the schema)
      best.select(col("qid"), lit(null).cast("double").as("_amin"))
        .filter(lit(false))
    } else {
      val checked = Similarity.verifyStamp(index,
        combinedStamp(Similarity.codebookStamp(cents), cb),
        "semanticDedupFlagsPqHybrid")
      // LUTs ship for the BAND-SIZED query subset only — the bounded
      // form of the cost ADC pays for the whole batch
      val qluts = batch
        .select(col(batchIdCol).as("qid"),
          col(batchVecCol).cast("array<double>").as("qvec"))
        .join(broadcast(bandQids), Seq("qid"))
        .select(col("qid"),
          GraftFunctions.pq_lut(col("qvec"), cbLit(cb), cb.m, cb.k)
            .as("_lut"))
      checked.filter(col("cell").cast("long").isin(cells: _*))
        .select(col(idCol), col("pq_code"))
        .join(broadcast(straddlers.select(col("qid"), col(idCol))),
          Seq(idCol))
        .join(broadcast(qluts), Seq("qid"))
        .select(col("qid"),
          round(GraftFunctions.pq_adc(col("_lut"), col("pq_code")), 5)
            .as("_adc"))
        .filter(col("_adc").isNotNull)
        .groupBy(col("qid")).agg(min(col("_adc")).as("_amin"))
    }
    val sdcKeep = col("sdc_dist").isNull || col("sdc_dist") > tauSdc
    val refinedKeep = col("_amin").isNull || col("_amin") > tauAdc
    batch.select(col(batchIdCol))
      .join(best, col(batchIdCol) === col("qid"), "left")
      .join(rescored, Seq("qid"), "left")
      .select(col(batchIdCol), col("neighbor_id"), col("sdc_dist"),
        when(col("sdc_dist").isNotNull &&
          abs(col("sdc_dist") - lit(tauSdc)) <= lit(band), refinedKeep)
          .otherwise(sdcKeep).as("keep"))
  }

  /** [[ivfPqSearchBatchSdc]] for query batches past ITS broadcast-size
    * contract — the SDC twin of [[ivfPqSearchBatchChunked]], with the
    * default chunk sized 64× larger: an SDC chunk ships ~100 bytes per
    * query (the m-byte code + the (qid, cell) probe pairs) where an
    * ADC chunk ships the m·k-double LUT (16 KB at m=8/k=256), so the
    * same ~50 MB broadcast budget admits 64× the queries. Hash chunks
    * (`pmod(xxhash64(qid), nChunks)`), one scalar count to size them,
    * per-query top-k independent of every other query ⇒ the union is
    * result-identical to the single-shot probe (PqSpec asserts it);
    * the shared m·k² table is a plan constant either way.
    */
  def ivfPqSearchBatchSdcChunked(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, index: DataFrame, idCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true,
      maxCodeBatch: Int = 524288): DataFrame =
    ivfPqSearchBatchSdcChunkedFrom(queries, queryIdCol, queryVecCol,
      index, idCol, Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, k, nProbe, excludeSelf, maxCodeBatch)

  /** [[ivfPqSearchBatchSdcChunked]] over a PRE-COLLECTED codebook —
    * ONE centroid collect for every chunk (the DataFrame entry point
    * re-collected per chunk; r18).
    */
  private[graft] def ivfPqSearchBatchSdcChunkedFrom(queries: DataFrame,
      queryIdCol: String, queryVecCol: String, index: DataFrame,
      idCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true,
      maxCodeBatch: Int = 524288): DataFrame = {
    require(maxCodeBatch >= 1, "maxCodeBatch must be ≥ 1")
    val nQueries = queries.count()
    val nChunks =
      math.max(1L, (nQueries + maxCodeBatch - 1) / maxCodeBatch).toInt
    if (nChunks <= 1)
      ivfPqSearchBatchSdcFrom(queries, queryIdCol, queryVecCol, index,
        idCol, cents, cb, k, nProbe, excludeSelf)
    else (0 until nChunks).map { chunk =>
      // an unlucky-empty chunk probes nothing and unions empty — safe
      ivfPqSearchBatchSdcFrom(
        queries.filter(
          pmod(xxhash64(col(queryIdCol)), lit(nChunks)) === lit(chunk)),
        queryIdCol, queryVecCol, index, idCol, cents, cb, k, nProbe,
        excludeSelf)
    }.reduce(_ union _)
  }

  /** [[graft.ops.Similarity.semanticDedupFlags]] over an IVF-PQ index
    * — the NO-FULL-VECTOR dedup regime: the probed cells' scan reads
    * (id, pq_code) only, so flagging a batch against a 10⁹-vector
    * corpus never touches the ~0.5 TB embedding payload (the plain
    * variant's index stores it per row). Same flag semantics: each
    * batch row gets its single nearest indexed neighbor — ADC-scored
    * top-1 through the k=1 `min_by` partial aggregate, metric "l2"
    * (ascending squared distance, the measured-better choice for
    * cosine-normalized corpora per [[metricPieces]]) — and
    * `keep = no neighbor within tauDist` (probed-cell misses surface
    * as NULL neighbors ⇒ keep, exactly the plain variant's LEFT-join
    * contract). The trade is quantization error in the SCORE: a true
    * near-dup straddling tauDist by less than the ADC error can flip,
    * which is the recall/τ study SemDedupBench runs; the structure
    * (probe, candidates, determinism) is identical.
    *
    * Returns (batchIdCol, neighbor_id, adc_dist, keep). Same
    * `excludeSelf` contract as the plain variant: true when batch and
    * corpus share an id space, false when ids are independent.
    *
    * The probe goes through [[ivfPqSearchBatchChunked]] (result-
    * identical to single-shot by construction), so a batch past the
    * per-query-LUT broadcast ceiling splits into bounded hash chunks
    * automatically — MEASURED failure without it: a 10⁵-row batch's
    * LUT frame overran `spark.driver.maxResultSize` (1 GB) at the
    * broadcast-build collect (HybridBench 1M first cut, r17); 10⁴-row
    * micro-batches sat under the ceiling, which is why the streaming
    * ingest never hit it.
    */
  def semanticDedupFlagsPq(batch: DataFrame, batchIdCol: String,
      batchVecCol: String, index: DataFrame, idCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, tauDist: Double, nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame =
    semanticDedupFlagsPqFrom(batch, batchIdCol, batchVecCol, index,
      idCol, Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, tauDist, nProbe, excludeSelf)

  /** [[semanticDedupFlagsPq]] over a PRE-COLLECTED codebook — see
    * [[semanticDedupFlagsPqSdcFrom]].
    */
  private[graft] def semanticDedupFlagsPqFrom(batch: DataFrame,
      batchIdCol: String, batchVecCol: String, index: DataFrame,
      idCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, tauDist: Double, nProbe: Int = 2,
      excludeSelf: Boolean = true): DataFrame = {
    val top = ivfPqSearchBatchChunkedFrom(batch, batchIdCol, batchVecCol,
      index, idCol, cents, cb,
      k = 1, nProbe = nProbe, excludeSelf = excludeSelf, metric = "l2")
      .select(col("qid"), col(idCol).as("neighbor_id"), col("adc_dist"))
    batch.select(col(batchIdCol))
      .join(top, col(batchIdCol) === col("qid"), "left")
      .select(col(batchIdCol), col("neighbor_id"), col("adc_dist"),
        (col("adc_dist").isNull || col("adc_dist") > tauDist).as("keep"))
  }

  /** [[ivfPqSearchBatch]] for query batches past its broadcast-size
    * contract (~10⁴ queries at m=16/k=256): the batch splits into
    * `ceil(|batch| / maxLutBatch)` HASH chunks
    * (`pmod(xxhash64(qid), nChunks)`) and each chunk runs the ordinary
    * probe; results union. Per-query top-k is independent of every
    * other query, so the union is result-identical to the single-shot
    * probe (PqSpec asserts equality against it) regardless of which
    * chunk a query hashes into; the cost is one stamp check +
    * probe-cell selection per chunk — O(|batch|/maxLutBatch) probes,
    * each chunk's LUT broadcast bounded at ~maxLutBatch·m·k doubles.
    *
    * The ONLY driver-side materialization is one scalar `count` of the
    * batch (sizing nChunks). The previous form collected every
    * distinct qid to the driver to build IN-lists — O(|batch|) driver
    * memory, GBs at a 10⁸-query corpus-refresh batch, i.e. the same
    * failure class the chunking exists to bound. Hash chunks are
    * Binomial(|batch|, 1/nChunks)-sized: mean maxLutBatch, stddev
    * ~√maxLutBatch, so even a +5σ outlier chunk overshoots the LUT
    * budget by ~√(1/maxLutBatch) relative (≈1% at the 8192 default) —
    * noise against the broadcast ceiling's ~3× headroom.
    */
  def ivfPqSearchBatchChunked(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, index: DataFrame, idCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true, metric: String = "l2",
      maxLutBatch: Int = 8192): DataFrame =
    ivfPqSearchBatchChunkedFrom(queries, queryIdCol, queryVecCol, index,
      idCol, Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, k, nProbe, excludeSelf, metric, maxLutBatch)

  /** [[ivfPqSearchBatchChunked]] over a PRE-COLLECTED codebook —
    * ONE centroid collect for every chunk (r18).
    */
  private[graft] def ivfPqSearchBatchChunkedFrom(queries: DataFrame,
      queryIdCol: String, queryVecCol: String, index: DataFrame,
      idCol: String, cents: Seq[(Long, Seq[Double])],
      cb: Codebook, k: Int, nProbe: Int = 2,
      excludeSelf: Boolean = true, metric: String = "l2",
      maxLutBatch: Int = 8192): DataFrame = {
    require(maxLutBatch >= 1, "maxLutBatch must be ≥ 1")
    val nQueries = queries.count()
    val nChunks =
      math.max(1L, (nQueries + maxLutBatch - 1) / maxLutBatch).toInt
    if (nChunks <= 1)
      ivfPqSearchBatchFrom(queries, queryIdCol, queryVecCol, index,
        idCol, cents, cb, k, nProbe, excludeSelf, metric)
    else (0 until nChunks).map { chunk =>
      // an unlucky-empty chunk probes nothing and unions empty — safe
      ivfPqSearchBatchFrom(
        queries.filter(
          pmod(xxhash64(col(queryIdCol)), lit(nChunks)) === lit(chunk)),
        queryIdCol, queryVecCol, index, idCol, cents, cb, k, nProbe,
        excludeSelf, metric)
    }.reduce(_ union _)
  }

  /** IVF-PQ search with an exact re-rank tail: take the top
    * `k·refineFactor` ADC candidates per query, fetch ONLY those rows'
    * full vectors from `vectors` — a cell-partitioned full-vector
    * layout of the SAME corpus (a reloaded
    * [[Similarity.ivfIndexWrite]] tree; [[ivfPqIndexWritePair]] emits
    * both trees from one corpus pass) — and re-rank by exact cosine.
    * The standard IVFADC+refine shape: ADC error only matters when it
    * reorders across the refine boundary, measured in PQ_*_r11.json.
    *
    * The fetch is CELL-PRUNED, not an id join against the raw corpus:
    * candidates keep the `cell` the probe found them in, and since the
    * vector layout is assigned under the same (stamp-verified) IVF
    * codebook, each candidate's vector lives in exactly that cell's
    * directory — so a static `cell IN (candidate cells)` filter prunes
    * the fetch scan to ≤ nProbe·|batch| cells' files (numFiles-gated
    * in PlanRegressionSpec). Without this, the fetch would broadcast-
    * join without shuffling but still READ every corpus row's vector
    * payload — at 10⁹ vectors the ~0.5 TB scan per refine batch this
    * tier exists to avoid. Both sidecar stamps are verified before any
    * plan is built: a vector tree assigned under a different codebook
    * would place candidates in other cells and silently drop them.
    *
    * Returns (qid, `idCol`, cos_sim) — top `k` per query by rounded
    * cosine descending, id tie-break.
    */
  def ivfPqSearchRefined(queries: DataFrame, queryIdCol: String,
      queryVecCol: String, index: DataFrame, vectors: DataFrame,
      sourceIdCol: String, sourceVecCol: String,
      centroids: DataFrame, centroidIdCol: String, centroidVecCol: String,
      cb: Codebook, k: Int, nProbe: Int = 2, refineFactor: Int = 4,
      excludeSelf: Boolean = true, metric: String = "l2"): DataFrame =
    ivfPqSearchRefinedFrom(queries, queryIdCol, queryVecCol, index,
      vectors, sourceIdCol, sourceVecCol,
      Similarity.collectCodebook(centroids, centroidIdCol,
        centroidVecCol), cb, k, nProbe, refineFactor, excludeSelf,
      metric)

  /** [[ivfPqSearchRefined]] over a PRE-COLLECTED codebook — ONE
    * centroid collect feeds the vector-tree stamp check AND the inner
    * ADC probe (which previously re-collected through the public
    * [[ivfPqSearchBatch]]) (r19).
    */
  private[graft] def ivfPqSearchRefinedFrom(queries: DataFrame,
      queryIdCol: String, queryVecCol: String, index: DataFrame,
      vectors: DataFrame, sourceIdCol: String, sourceVecCol: String,
      cents: Seq[(Long, Seq[Double])],
      cb: Codebook, k: Int, nProbe: Int = 2, refineFactor: Int = 4,
      excludeSelf: Boolean = true, metric: String = "l2"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(refineFactor >= 1, "refineFactor must be ≥ 1")
    val checkedVecs = Similarity.verifyStamp(vectors,
      Similarity.codebookStamp(cents), "ivfPqSearchRefined",
      desc = "refine vector layout assigned under a different codebook")
    // candidate-sized by construction (k·refineFactor·|batch| rows);
    // checkpointed because it feeds TWO consumers — the cell collect
    // and the fetch join — and re-running the ADC probe per consumer
    // would double the probe cost
    val cand = ivfPqSearchBatchFrom(queries, queryIdCol, queryVecCol,
      index, sourceIdCol, cents, cb,
      k = k * refineFactor, nProbe = nProbe, excludeSelf = excludeSelf,
      metric = metric)
      .select(col("qid"), col(sourceIdCol), col("cell"))
      .localCheckpoint(true)
    // the reloaded layout's partition column may infer as int — cast
    // before collecting so the IN-list is type-stable
    val candCells = cand.select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    // PAIR-SYNC GUARD: the code tree and the vector tree agree
    // row-for-row when built/appended as a pair ([[ivfPqIndexWritePair]]
    // / [[ivfPqIndexAppendPair]]); an append to ONE tree keeps both
    // stamps valid (the codebooks are unchanged) but desyncs the rows,
    // and the fetch's inner join would then silently drop appended
    // candidates from the refine results. Count the candidate cells on
    // both sides — partition-pruned, column-pruned scans (row counts
    // come from footer metadata; no code or vector payload is read) —
    // and refuse a desynced pair loudly.
    val codeRows = index
      .filter(col("cell").cast("long").isin(candCells: _*)).count()
    val vecRows = checkedVecs
      .filter(col("cell").cast("long").isin(candCells: _*)).count()
    if (codeRows != vecRows) throw new IllegalStateException(
      "ivfPqSearchRefined: code tree and vector tree disagree in the " +
        s"candidate cells (${candCells.mkString(",")}): $codeRows code " +
        s"rows vs $vecRows vector rows. " +
        (if (codeRows > vecRows)
          "The code tree is ahead — refining would silently drop the " +
            "extra rows' candidates. "
        else
          "The vector tree is ahead — the code tree is stale and the " +
            "probe is blind to the extra rows. ") +
        "Append with ivfPqIndexAppendPair (or rebuild with " +
        "ivfPqIndexWritePair) so both trees ingest together.")
    val qv = queries.select(col(queryIdCol).as("qid"),
      col(queryVecCol).cast("array<double>").as("qvec"))
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col(sourceIdCol).asc)
    // static cell pruning on the fetch scan + an EXPLICIT candidate
    // broadcast: the pruned vector read is still the big side (a cell
    // holds corpus/|codebook| rows), and relying on AQE stats for the
    // join side risks a sort-merge plan that shuffles it on id —
    // plan-gated (join strategy AND numFiles) in PlanRegressionSpec
    checkedVecs
      .filter(col("cell").isin(candCells: _*))
      .select(col(sourceIdCol),
        col(sourceVecCol).cast("array<double>").as("_sv"))
      .join(broadcast(cand.select(col("qid"), col(sourceIdCol))),
        Seq(sourceIdCol))
      .join(broadcast(qv), Seq("qid"))
      .select(col("qid"), col(sourceIdCol),
        round(GraftFunctions.cosine_sim(col("_sv"), col("qvec")), 5)
          .as("cos_sim"))
      .withColumn("_rn", row_number().over(wTop))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
