package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Corpus deduplication operators: exact (hash-groupBy), MinHash
  * signatures + banded grouping, SimHash, and token-set Jaccard.
  *
  * Scale design: every op is a hash-partitioned groupBy on a derived key —
  * no global sort, no driver collect. MinHash banding turns the O(n²)
  * near-dup pair search into an equi-join on band keys, which Spark
  * executes as a shuffle-hash join keyed by the band; at 100 TB the band
  * key cardinality keeps bucket sizes bounded (full-signature bands ⇒
  * only true near-identical sets collide).
  *
  * Hash functions are md5-based (not Spark-internal murmur3) so results
  * are portable across engines — the DuckDB oracle computes the same
  * signatures.
  */
object Dedup {

  /** Exact-dup keep/drop decision per row: keep the smallest id per
    * normalized-content hash. One shuffle on the content hash.
    */
  def exactDedupFlags(df: DataFrame, textCol: String, idCol: String)
  : DataFrame = {
    val h = fingerprint(col(textCol)).as("content_hash")
    val w = Window.partitionBy(col("content_hash"))
    df.select(col(idCol), h)
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keep", col(idCol) === min(col(idCol)).over(w))
  }

  /** Salted-min MinHash signature over the distinct token set. Each salt
    * yields an independent permutation approximation; the signature is the
    * k min md5 digests. Portable: min over lexicographic md5 hex strings.
    *
    * Zero shuffle: at 100 TB the signatures materialize during the scan,
    * and only the (tiny) signature columns ever move for banding. This
    * Column form (`array_min ∘ transform`) is the executable
    * specification of [[graft.functions.SaltedMinhashKernel]], which
    * [[minhashAgg]] runs in production (one native pass for all salts;
    * DedupSpec asserts parity).
    */
  def minhashSig(textCol: Column, salt: String): Column =
    array_min(transform(tokenSet(textCol),
      t => md5(concat(lit(salt), t))))

  def minhashAgg(df: DataFrame, textCol: String, idCol: String,
      salts: Seq[String] = Seq("a", "b", "c", "d")): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    df.select(col(idCol),
      column(graft.functions.SaltedMinhashSigs(
        expression(tokenSet(col(textCol))), salts)).as("_s"))
      .select(col(idCol) +: salts.zipWithIndex.map { case (s, i) =>
        element_at(col("_s"), i + 1).as(s"sig_$s") }: _*)
  }

  /** Near-dup groups: documents whose full MinHash signature collides.
    * Returns one row per group with size > 1.
    */
  def minhashDupGroups(df: DataFrame, textCol: String, idCol: String,
      salts: Seq[String] = Seq("a", "b", "c", "d")): DataFrame = {
    val sigs = minhashAgg(df, textCol, idCol, salts)
    val sigCols = salts.map(s => col(s"sig_$s"))
    sigs.groupBy(sigCols: _*)
      .agg(count(lit(1)).as("group_size"),
        min(col(idCol)).as("keeper"))
      .filter(col("group_size") > 1)
  }

  /** Real b×r MinHash banding (default 16 salted signatures in 4 bands
    * of 4): docs agreeing on ALL r signatures within ANY band become
    * candidate pairs — the classic LSH candidate generator with catch
    * probability 1−(1−j^r)^b at Jaccard j (r=4, b=4: ≈0.99 at j=0.9,
    * ≈0.50 at j≈0.68), the recall the single full-signature band
    * misses. Candidates are then verified with exact token-set Jaccard
    * and filtered at `minJaccard`.
    *
    * Scale shape: signatures materialize inline during the scan (zero
    * shuffle); the band join is an equi-join on (band, band_sig) — hash-
    * partitioned by band key, never all-pairs; the verify join rejoins
    * only the candidate ids to their token sets. Bucket sizes stay
    * bounded at 100 TB because r-of-r signature agreement within a band
    * only happens for genuinely similar docs.
    *
    * Exact duplicates are PRE-COLLAPSED: only the smallest-id row per
    * normalized-content fingerprint is banded, so byte-identical docs
    * never appear as pairs here (a group of g identical docs would
    * otherwise contribute g·(g−1)/2 trivial jaccard-1.0 pairs — the
    * quadratic blow-up on template corpora). Output pairs are between
    * group REPRESENTATIVES only; full exact-dup membership comes from
    * [[exactDedupFlags]]. Use [[minhashBandPairsOver]] with
    * `collapseExactOn = None` to band every row.
    */
  def minhashBandPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 16, bands: Int = 4, minJaccard: Double = 0.5)
  : DataFrame =
    minhashBandPairsOver(df, tokenSet(col(textCol)), idCol, numHashes,
      bands, minJaccard,
      collapseExactOn = Some(fingerprint(col(textCol))))

  /** The XOR-permutation constants for the k minhash functions —
    * golden-ratio multiples masked to 60 bits (below the base-hash
    * range, overflow-free in both engines). Public so the DuckDB
    * oracles derive the identical family from one source of truth.
    */
  def xorConstants(n: Int): Seq[Long] =
    (1 to n).map(i => (0x9E3779B97F4A7C15L * i) & 0x0FFFFFFFFFFFFFFFL)

  /** (id, band, band_sig) rows for the b×r banding join: one md5 per
    * token materialized in a dedicated projection, k XOR-mixed min-sigs
    * folded over the hashed array, bands exploded. Shared by the
    * within-corpus pair search and the batch-vs-corpus incremental
    * path, and public as THE materializable near-dup index: persist
    * this frame `partitionBy("band")` and an ingest — batch or stream —
    * flags near-dups with a plain equi-join against it, no corpus
    * re-scan ([[crossDedupFlags]] derives it inline; a production
    * deployment writes it once per corpus build). The layout is
    * load-bearing: a lookup restricted to a band subset reads only
    * those directories — both static (metadata pruning) and through
    * the equi-join (dynamic partition pruning), proven by numFiles in
    * PlanRegressionSpec; StreamingSpec's ingest lookup runs against
    * the persisted layout.
    */
  def bandIndex(df: DataFrame, tokensExpr: Column, idCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must split evenly into $bands bands")
    // every PERSISTABLE band frame carries its build stamp — a lookup
    // banded differently than the stored index silently finds nothing,
    // and [[crossDedupFlagsFromIndexes]] turns the stamp into a loud
    // error; the internal bandRowsOf paths stay stampless (the column
    // would ride every candidate shuffle for nothing)
    bandRowsOf(df, tokensExpr, idCol, numHashes, bands)
      .withColumn("_params", lit(bandParams(numHashes, bands)))
  }

  /** (id, _sigs) — md5 + all k xor-min signatures in ONE native pass
    * over the token array ([[graft.functions.MinhashSigs]]; the Column
    * form paid an interpreted hashing transform plus k CodegenFallback
    * array_min sweeps per row). Split out of [[bandRowsOf]] so
    * [[minhashBandPairsOver]] can checkpoint THIS narrow frame
    * (~numHashes longs/doc) and explode bands from it on both sides of
    * its self-join.
    */
  private def sigRowsOf(df: DataFrame, tokensExpr: Column, idCol: String,
      numHashes: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    df.select(col(idCol).as("id"), tokensExpr.as("_t"))
      .filter(size(col("_t")) > 0) // empty docs: no sigs, no bands
      .select(col("id"),
        column(graft.functions.MinhashSigs(expression(col("_t")),
          xorConstants(numHashes))).as("_sigs"))
  }

  /** Explode the k signatures into (id, band, band_sig) rows — the
    * per-band slices are attribute reads over the materialized `_sigs`
    * column.
    */
  private def bandRowsFromSigs(withSigs: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val r = numHashes / bands
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        concat_ws("_", (b * r until (b + 1) * r).map(j =>
          element_at(col("_sigs"), j + 1).cast("string")): _*)
          .as("band_sig")))
    withSigs
      .select(col("id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"),
        col("bs.band_sig").as("band_sig"))
  }

  private def bandRowsOf(df: DataFrame, tokensExpr: Column, idCol: String,
      numHashes: Int, bands: Int): DataFrame =
    bandRowsFromSigs(sigRowsOf(df, tokensExpr, idCol, numHashes),
      numHashes, bands)

  /** The banding machinery over an arbitrary shingle/token-set
    * expression (`graft.functions.TextFunctions.wordShingles` gives the
    * order-sensitive shingle→minhash→band→bucket-join pipeline).
    *
    * Hash family: ONE cryptographic hash per token (first 60 bits of
    * md5), then `numHashes` XOR permutations of it — the standard
    * MinHash construction (k cheap mixes of one strong hash, not k full
    * hashes; XOR by a constant is a bijection of the hash space). At
    * corpus scale this is the difference between 1 and k md5 passes
    * over every shingle array. Portable: DuckDB derives the same 60-bit
    * base hash via CAST('0x'||substring(md5(t),1,15) AS BIGINT).
    *
    * Scale notes: candidates and output are bounded by the corpus's
    * TRUE near-dup structure — a dup-heavy corpus yields many pairs by
    * definition. Token-SET jaccard saturates on template-generated text
    * (shared vocabulary ⇒ half of all pairs can exceed 0.5); the
    * shingle variant stays discriminative there.
    *
    * `collapseExactOn`: exact-dup pre-collapse key (e.g. the content
    * fingerprint). When set, only the smallest-id row per key is banded
    * — identical docs collapse to ONE representative BEFORE the band
    * join, so a group of g byte-identical docs contributes 0 candidate
    * pairs instead of g·(g−1)/2. On template/duplicate-heavy corpora
    * this is the difference between a bounded candidate set and a
    * quadratic blow-up; exact duplicates are already fully handled by
    * [[exactDedupFlags]], which reports every member. Costs one window
    * shuffle on the key — the same shuffle exactDedupFlags pays.
    */
  def minhashBandPairsOver(df: DataFrame, tokensExpr: Column,
      idCol: String, numHashes: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.5, collapseExactOn: Option[Column] = None)
  : DataFrame = {
    require(numHashes > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must split evenly into $bands bands")
    val source = collapseExactOn.fold(df)(keepersByKey(df, _, idCol))
    // ONE text scan + ONE pre-collapse window for the whole pair build:
    // the narrow (id, sigs) frame (~numHashes longs/doc) is lazily
    // checkpointed so both sides of the band self-join read it instead
    // of recomputing the scan+window+MinHash pipeline — the
    // un-checkpointed form planned FOUR separate text scans and four
    // keeper windows per pair frame (self-join sides + the two verify
    // joins; no ReusedExchange fires across the differing downstream
    // keys — measured in plans/r18/q84_minhash_band_pairs_before.txt,
    // r18 optimization)
    val sigs = sigRowsOf(source, tokensExpr, idCol, numHashes)
      .localCheckpoint(false)
    val bandRows = bandRowsFromSigs(sigs, numHashes, bands)
    val cands = bandRows.as("x")
      .join(bandRows.as("y"), Seq("band", "band_sig"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
      .distinct()
    // verify tokens straight off `df`, NOT `source`: every candidate id
    // is a keeper by construction (only keepers are banded), so the
    // pre-collapse window in the old verify lineage filtered nothing
    // the inner join doesn't — and dropping it removes two more
    // window shuffles + text scans from the plan. Token arrays are
    // derived only for ids the candidate join actually touches.
    val tokSets = df.select(col(idCol).as("id"), tokensExpr.as("toks"))
    val inter = size(array_intersect(col("toks1"), col("toks2")))
    cands
      .join(tokSets.select(col("id").as("id1"), col("toks").as("toks1")),
        "id1")
      .join(tokSets.select(col("id").as("id2"), col("toks").as("toks2")),
        "id2")
      .select(col("id1"), col("id2"),
        round(inter /
          (size(col("toks1")) + size(col("toks2")) - inter).cast("double"),
          4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Smallest-id row per exact key — the shared pre-collapse step: one
    * window shuffle on the key (the shuffle [[exactDedupFlags]] already
    * pays), after which duplicate groups are a single representative.
    */
  private def keepersByKey(df: DataFrame, key: Column, idCol: String)
  : DataFrame =
    df.withColumn("_ck", key)
      .withColumn("_keep", col(idCol) ===
        min(col(idCol)).over(Window.partitionBy(col("_ck"))))
      .filter(col("_keep")).drop("_ck", "_keep")

  /** 16-bit SimHash from md5 hex digits of distinct tokens: bit j is the
    * sign of Σ_tokens (digit_j(md5(tok)) >= '8' ? +1 : -1). Portable
    * across engines; near-dup docs land on nearby codes.
    */
  def simhash16(df: DataFrame, textCol: String, idCol: String): DataFrame =
    simhashOver(df, tokenSet(col(textCol)), idCol, nBits = 16)

  /** SimHash code as a pure per-row COLUMN: bit j of the code is the
    * sign of Σ_tokens (digit_j(md5(tok)) >= '8' ? +1 : −1), for up to
    * 32 bits (md5 supplies 32 hex digits).
    *
    * Zero shuffle AND zero interpreted per-element work: the native
    * codegen kernel ([[graft.functions.SimhashKernel]]) runs one MD5
    * pass per token and accumulates the bit sums in a local int array —
    * the signature materializes during the scan, like the MinHash
    * signatures. The previous explode → nBits-sum groupBy shape paid a
    * corpus-cardinality shuffle of (id, token-hash) rows for the same
    * arithmetic (at 100 TB that shuffle IS the job), and an
    * `aggregate`/`zip_with` fold pays ~nBits boxed lambda calls per
    * token (Spark HOFs are CodegenFallback — measured 2.3× slower than
    * even the shuffle shape).
    */
  def simhashCode(tokensExpr: Column, nBits: Int = 32): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(graft.functions.SimhashCode(expression(tokensExpr), nBits))
  }

  /** Generalized SimHash per document. Empty token sets emit no row
    * (parity with the historical explode shape: a doc with no tokens has
    * no meaningful code).
    */
  def simhashOver(df: DataFrame, tokensExpr: Column, idCol: String,
      nBits: Int = 32): DataFrame =
    df.select(col(idCol), tokensExpr.as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col(idCol), simhashCode(col("_toks"), nBits).as("simhash"))

  /** SimHash Hamming-neighbor pairs — the lookup the codes exist for:
    * split the code into `bands` bit-ranges; by pigeonhole any pair
    * within Hamming distance < bands agrees EXACTLY on at least one
    * band, so the candidate search is an equi-join on (band, band_bits)
    * — never all-pairs — followed by an exact popcount verify at
    * `maxHamming`. Same b×r trick as MinHash banding, in Hamming space.
    *
    * Defaults are the scale shape: a 32-bit code over 3-word SHINGLES in
    * 4 bands of 8 bits. Shingles keep the code discriminative on
    * template-heavy corpora where token-SET codes collapse (shared
    * vocabulary ⇒ near-identical bit sums for almost all docs), and
    * 8-bit bands give 256 buckets/band where 4-bit bands give 16 — the
    * difference between a bounded candidate join and corpus²/16. Exact
    * dups are pre-collapsed (identical docs ⇒ distance 0 — they would
    * dominate candidates and are already reported by
    * [[exactDedupFlags]]). The code travels WITH the band rows, so the
    * verify needs no rejoin to the corpus.
    *
    * '''Small-corpus / compat variant.''' The 8-bit band key is a fixed
    * 256-value domain, so per-bucket occupancy — and with it the
    * candidate join — grows as n²/2⁹ once n ≫ 256·bands (measured: OOM
    * at 500k docs, SCALE_r09.md §4). For any corpus that can grow, use
    * [[simhashNeighbors64]] — the default entry point — whose 16-bit
    * bands push the occupancy knee out 256×.
    */
  @deprecated("the 8-bit band key's fixed 256-value domain makes " +
    "candidate pairs grow n²/2⁹ — measured OOM at 500k docs " +
    "(SCALE_r09.md §4). Use simhashNeighbors64, whose 16-bit bands " +
    "push the occupancy knee out 256×; keep this form only for " +
    "corpora provably bounded ≪ 100k docs that must match a stored " +
    "32-bit code.", "round 10")
  def simhashNeighbors(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 2): DataFrame =
    simhashNeighborsOver(df, wordShingles(col(textCol), 3), idCol,
      maxHamming = maxHamming,
      collapseExactOn = Some(fingerprint(col(textCol))))

  /** `maxBucket` is the hot-bucket guard: band bits are NOT uniformly
    * distributed (template-heavy corpora skew the sign sums), so a
    * single bucket can approach corpus size. Buckets at or under the
    * threshold expand to pairs via the grouped array pass; buckets OVER
    * it are routed to a streamed equi-join on the bucket key instead —
    * same pairs, but never a corpus-sized `collect_list` row on one
    * executor. Both branches consume the same (band, bits)-partitioned
    * window output, so the guard costs no extra shuffle.
    */
  @deprecated("32-bit codes cap bands at 8 bits (n²/2⁹ candidate " +
    "growth, measured OOM at 500k docs — SCALE_r09.md §4); use " +
    "simhashNeighbors64Over unless a stored 32-bit code must be " +
    "matched on a provably small corpus.", "round 10")
  def simhashNeighborsOver(df: DataFrame, tokensExpr: Column,
      idCol: String, nBits: Int = 32, bands: Int = 4, maxHamming: Int = 2,
      collapseExactOn: Option[Column] = None, maxBucket: Int = 4096)
  : DataFrame = {
    require(nBits % bands == 0,
      s"nBits ($nBits) must split evenly into $bands bands")
    // the md5-digit construction ([[SimhashCode]]) supplies at most 32
    // bits, and 32 also keeps the packed code exact through the
    // unsigned conv → signed long cast below (a 64-bit MSB-set code
    // would NULL out and silently drop its pairs at the verify)
    require(nBits >= 1 && nBits <= 32,
      s"nBits ($nBits) must be in [1, 32]: simhash bits come from md5's " +
        "32 hex digits")
    require(maxHamming < bands,
      s"pigeonhole: $bands bands only guarantee recall for distance < $bands")
    val r = nBits / bands
    // Code AND collapse key materialize in-scan (simhashCode is a pure
    // projection); the collapse window then shuffles only the narrow
    // (id, key, code) rows — the document text never moves.
    val coded = df
      .select(col(idCol).as("id") +: tokensExpr.as("_toks") +:
        collapseExactOn.map(_.as("_ck")).toSeq: _*)
      .filter(size(col("_toks")) > 0)
      .select(col("id") +: simhashCode(col("_toks"), nBits).as("simhash") +:
        collapseExactOn.map(_ => col("_ck")).toSeq: _*)
    val codes =
      if (collapseExactOn.isEmpty) coded
      else keepersByKey(coded, col("_ck"), "id")
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        substring(col("simhash"), b * r + 1, r).as("bits")))
    // One shuffle on (band, bits); the bucket-size window rides it, and
    // both guard branches below reuse the same exchange. The bit-string
    // code collapses to ONE long before the shuffle: the verify is then
    // `bit_count(xor)` — a single codegen'd instruction per pair — and
    // every downstream row ships 8 bytes instead of nBits chars.
    val bandRows = codes
      .select(col("id"),
        conv(col("simhash"), 2, 10).cast("long").as("code"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("code"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    bandedHammingPairs(bandRows, maxHamming, maxBucket)
  }

  /** Packed 64-bit SimHash per document (LONG column `simhash64`).
    * Empty token sets emit no row, matching [[simhashOver]].
    */
  def simhash64Over(df: DataFrame, tokensExpr: Column, idCol: String)
  : DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    df.select(col(idCol), tokensExpr.as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col(idCol),
        column(graft.functions.Simhash64Code(expression(col("_toks"))))
          .as("simhash64"))
  }

  /** 64-bit banded Hamming-neighbor pairs over 3-word shingles — '''the
    * default SimHash neighbor entry point'''. Same b×r pigeonhole
    * search as [[simhashNeighbors]], but the code is the packed-long
    * [[graft.functions.Simhash64Code]] and the 4 bands are 16 bits
    * wide: 65,536 buckets per band where the 32-bit form has 256. The
    * 8-bit band key is a FIXED domain — per-bucket occupancy, and with
    * it the candidate join, grows as n²/2⁹ on ANY corpus once
    * n ≫ 256·bands (measured: the quadratic term overtakes the
    * char-linear scan between 50k and 500k docs, SCALE_r09.md §4). 16-bit
    * bands push that knee out 256×, and
    * [[simhashNeighbors64Over]]'s `bandBits` parameterizes it further
    * for corpora past ~10⁷ docs. Prefer this form unless the corpus is
    * provably bounded ≪ 100k docs AND a stored 32-bit code must be
    * matched.
    */
  def simhashNeighbors64(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 2): DataFrame =
    simhashNeighbors64Over(df, wordShingles(col(textCol), 3), idCol,
      maxHamming = maxHamming,
      collapseExactOn = Some(fingerprint(col(textCol))))

  /** Long-code variant of [[simhashNeighborsOver]]: bands are bit
    * ranges of the packed 64-bit code, extracted MSB-first with
    * shift+mask (no string ever materializes). `bandBits` must divide
    * 64; recall is guaranteed for `maxHamming < 64/bandBits` by
    * pigeonhole, and the call refuses settings that void the
    * guarantee unless `allowPartialRecall` opts in EXPLICITLY —
    * bandBits = 32 with maxHamming = 2 finds a distance-2 pair only
    * when both flipped bits land in the same 32-bit band.
    *
    * MEASURED (graft.BandBench, 1M docs, BAND_1m_r11.json): the
    * 16-bit default's candidate occupancy is the knee past ~10⁷ docs
    * (n²/2¹⁶ per band; 3.6× cost at docs ×2, SCALE_r10 §2); 32-bit
    * bands push the occupancy domain to 2³² at a measured
    * pairs-recall cost recorded in SCALE_r11 §2 — every missed pair
    * sits at exactly Hamming 2, the pigeonhole edge.
    */
  def simhashNeighbors64Over(df: DataFrame, tokensExpr: Column,
      idCol: String, bandBits: Int = 16, maxHamming: Int = 2,
      collapseExactOn: Option[Column] = None, maxBucket: Int = 4096,
      allowPartialRecall: Boolean = false)
  : DataFrame = {
    require(64 % bandBits == 0 && bandBits >= 1 && bandBits <= 32,
      s"bandBits ($bandBits) must divide 64 and leave ≥2 bands")
    val bands = 64 / bandBits
    require(maxHamming < bands || allowPartialRecall,
      s"pigeonhole: $bands bands only guarantee recall for distance < " +
        s"$bands — pass allowPartialRecall=true to accept probabilistic " +
        "recall at this bandBits (trade measured in SCALE_r11)")
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val coded = df
      .select(col(idCol).as("id") +: tokensExpr.as("_toks") +:
        collapseExactOn.map(_.as("_ck")).toSeq: _*)
      .filter(size(col("_toks")) > 0)
      .select(col("id") +:
        column(graft.functions.Simhash64Code(expression(col("_toks"))))
          .as("code") +:
        collapseExactOn.map(_ => col("_ck")).toSeq: _*)
    val codes =
      if (collapseExactOn.isEmpty) coded
      else keepersByKey(coded, col("_ck"), "id")
    bandedHammingPairs(simhash64BandRows(codes, bandBits), maxHamming,
      maxBucket)
  }

  /** (id, code, band, bits) rows for the 64-bit banded Hamming join:
    * band b covers code bits [64−bandBits·(b+1), 64−bandBits·b) —
    * MSB-first, matching the hex-prefix reading order of the oracle's
    * bit-string rendering; shiftrightunsigned keeps the top band exact
    * on negative codes (MSB set). ONE definition shared by the
    * neighbor search and the fused flag chain so the band layout can
    * never silently drift between them.
    */
  private def simhash64BandRows(codes: DataFrame, bandBits: Int)
  : DataFrame = {
    val bands = 64 / bandBits
    val mask = (1L << bandBits) - 1 // bandBits ≤ 32 by callers' require
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("code"), 64 - bandBits * (b + 1))
          .bitwiseAND(lit(mask)).as("bits")))
    codes
      .select(col("id"), col("code"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("code"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
  }

  /** Shared tail of the banded Hamming search: bucket-occupancy window,
    * hot-bucket guard, popcount verify, cross-band dedup. `bandRows`
    * must carry (id, code: long, band, bits); one shuffle on
    * (band, bits) — the bucket-size window rides it, and both guard
    * branches reuse the same exchange. Every row ships the code as 8
    * bytes, so the verify is `bit_count(xor)` — one codegen'd
    * instruction per pair.
    */
  /** 128-bit SimHash neighbor pairs — the band-domain lever that does
    * NOT shrink the pigeonhole guarantee: 64-bit codes offer either
    * 16-bit bands (4 bands, H ≤ 2 guaranteed, 2¹⁶ occupancy domain —
    * quadratic knee past ~10⁶ docs, SCALE_r10 §2) or 32-bit bands
    * (2³² domain but only 2 bands ⇒ H ≤ 1 guaranteed; measured 29% of
    * the H ≤ 2 pairs lost, BAND_1m_r11.json). A 128-bit code with
    * 32-bit bands has BOTH: 4 bands ⇒ H ≤ 3 guaranteed by pigeonhole,
    * per-band occupancy n²/2³².
    *
    * The code is two independent 64-bit simhashes over the same
    * shingle set — the second over salt-suffixed shingles (`tok ⧺
    * "#2"`, mirrored exactly by the DuckDB oracle as `md5(tok ||
    * '#2')`) — so the existing native one-pass kernel runs twice in
    * the same scan and no new expression is needed. Hamming distance
    * is the sum of the two 64-bit XOR popcounts.
    *
    * CALIBRATION: distances here are ~Binomial-doubled versions of the
    * 64-bit code's (a 64-bit-H=2 pair lands at mean 4, sd ≈ 2), so
    * thresholds do NOT map proportionally — measured at 1M docs
    * (SCALE_r11 §2): H ≤ 3 keeps ~30% of the 64/16 H ≤ 2 population
    * (a substantially TIGHTER similarity notion), H ≤ 4 ~55%, with
    * disagreement in both directions because the longer code is a
    * √2-lower-variance estimator of the same shingle similarity.
    * Calibrate `maxHamming` (3…5 spans the 64-bit H ≤ 2 strictness
    * range; >3 needs `allowPartialRecall`) to the corpus rather than
    * porting the 64-bit threshold.
    */
  def simhashNeighbors128(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashNeighbors128Over(df, wordShingles(col(textCol), 3), idCol,
      maxHamming = maxHamming,
      collapseExactOn = Some(fingerprint(col(textCol))))

  /** See [[simhashNeighbors128]]. `bandBits` ∈ {8, 16, 32} (must
    * divide 64 so every band sits inside one of the two longs);
    * recall is guaranteed for `maxHamming < 128/bandBits`, and as in
    * the 64-bit form, voiding the guarantee requires the explicit
    * `allowPartialRecall` opt-in.
    */
  def simhashNeighbors128Over(df: DataFrame, tokensExpr: Column,
      idCol: String, bandBits: Int = 32, maxHamming: Int = 3,
      collapseExactOn: Option[Column] = None, maxBucket: Int = 4096,
      allowPartialRecall: Boolean = false): DataFrame = {
    require(64 % bandBits == 0 && bandBits >= 8 && bandBits <= 32,
      s"bandBits ($bandBits) must divide 64 (each band inside one long)")
    val bands = 128 / bandBits
    require(maxHamming < bands || allowPartialRecall,
      s"pigeonhole: $bands bands only guarantee recall for distance < " +
        s"$bands — pass allowPartialRecall=true to accept probabilistic " +
        "recall at this bandBits")
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val coded = df
      .select(col(idCol).as("id") +: tokensExpr.as("_toks") +:
        collapseExactOn.map(_.as("_ck")).toSeq: _*)
      .filter(size(col("_toks")) > 0)
      .select(col("id") +:
        column(graft.functions.Simhash64Code(expression(col("_toks"))))
          .as("hi") +:
        column(graft.functions.Simhash64CodeSalted(
          expression(col("_toks")), "#2")).as("lo") +:
        collapseExactOn.map(_ => col("_ck")).toSeq: _*)
    val codes =
      if (collapseExactOn.isEmpty) coded
      else keepersByKey(coded, col("_ck"), "id")
    // MSB-first across the 128-bit concat hi‖lo, matching the oracle's
    // bit-string rendering (chars 1–64 = hi, 65–128 = lo)
    val perLong = 64 / bandBits
    val mask = (1L << bandBits) - 1
    val bandStructs = (0 until bands).map { b =>
      val src = if (b < perLong) col("hi") else col("lo")
      val off = if (b < perLong) b else b - perLong
      struct(lit(b).as("band"),
        shiftrightunsigned(src, 64 - bandBits * (off + 1))
          .bitwiseAND(lit(mask)).as("bits"))
    }
    val bandRows = codes
      .select(col("id"), col("hi"), col("lo"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("hi"), col("lo"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
    bandedHammingPairs(bandRows, maxHamming, maxBucket,
      codeCols = Seq("hi", "lo"))
  }

  private def bandedHammingPairs(bandRowsIn: DataFrame, maxHamming: Int,
      maxBucket: Int, codeCols: Seq[String] = Seq("code")): DataFrame = {
    val bandRows = bandRowsIn
      .withColumn("_g", count(lit(1))
        .over(Window.partitionBy(col("band"), col("bits"))))
      .filter(col("_g") > 1)
    // Within-bucket pairs via ONE grouped pass, not a self-join: a
    // DataFrame self-join would evaluate the whole upstream (scan →
    // collapse window → shingle md5 fold) once per join side — Spark
    // reuses exchanges, not arbitrary subplans. Each (band, bits)
    // bucket materializes as one row whose member list expands to its
    // i<j pairs with array HOFs; `maxBucket` keeps that row bounded.
    // The HOF lambda copies the (id, code) structs VERBATIM — higher-
    // order functions run interpreted (CodegenFallback), so the
    // id-ordering arithmetic waits for the codegen'd projection after
    // the explode (measured ~4× less interpreted work per pair).
    val buckets = bandRows.filter(col("_g") <= maxBucket)
      .groupBy(col("band"), col("bits"))
      .agg(collect_list(struct(col("id") +: codeCols.map(col): _*))
        .as("ms"))
    val pairArr = flatten(transform(col("ms"), (m, i) =>
      transform(slice(col("ms"), i + lit(2), size(col("ms"))), n =>
        struct(m.as("a"), n.as("b")))))
    val smallCands = buckets.select(explode(pairArr).as("p"))
      .select(col("p.a.id").as("xid") +: col("p.b.id").as("yid") +:
        (codeCols.zipWithIndex.map { case (cc, i) =>
          col(s"p.a.$cc").as(s"ac$i") } ++
          codeCols.zipWithIndex.map { case (cc, i) =>
            col(s"p.b.$cc").as(s"bc$i") }): _*)
    // Hot buckets: equi-join on the bucket key streams the g² pair
    // enumeration through the shuffle machinery (spillable) instead of
    // collecting g members into one aggregation row.
    val hot = bandRows.filter(col("_g") > maxBucket)
      .select(col("id") +: col("band") +: col("bits") +:
        codeCols.map(col): _*)
    val hotCands = hot.as("x").join(hot.as("y"), Seq("band", "bits"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("xid") +: col("y.id").as("yid") +:
        (codeCols.zipWithIndex.map { case (cc, i) =>
          col(s"x.$cc").as(s"ac$i") } ++
          codeCols.zipWithIndex.map { case (cc, i) =>
            col(s"y.$cc").as(s"bc$i") }): _*)
    // Verify BEFORE the cross-band dedup: hamming is a pure function of
    // the pair, so the distinct shuffles (id1, id2, hamming) — two longs
    // and an int — and only for pairs that already passed the distance
    // cut. A pair caught by ≤`bands` bands recomputes the popcount that
    // many times; one xor+popcount beats shipping codes through a
    // shuffle.
    val ham = codeCols.indices.map(i =>
      bit_count(col(s"ac$i").bitwiseXOR(col(s"bc$i"))).cast("int"))
      .reduce(_ + _)
    smallCands.unionByName(hotCands)
      .select(least(col("xid"), col("yid")).as("id1"),
        greatest(col("xid"), col("yid")).as("id2"), ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental-ingest dedup: flag each BATCH document as an exact
    * and/or near duplicate of the existing CORPUS — the daily-ingest
    * decision ("is this new document already in the training set?")
    * without ever pairing batch docs against each other.
    *
    * Scale shape (batch ≪ corpus, the defining property of an ingest):
    * every corpus-sided step is MAP-SIDE — the batch fingerprints, band
    * rows, candidate ids, and token sets all broadcast, so the 100 TB
    * corpus is never shuffled. It IS read three times (fingerprint pass,
    * banding pass, candidate-pruned verify pass) — three scans, zero
    * shuffles; a production deployment amortizes the first two into the
    * stored fingerprint/band indexes. Exact membership is a
    * broadcast semi-join on the content fingerprint; near-dup candidates
    * come from the same b×r banding family as [[minhashBandPairsOver]]
    * (identical signatures, so a corpus-side band INDEX materialized by
    * a previous run is directly reusable), verified with exact Jaccard
    * at `minJaccard`.
    *
    * The near-dup unit is the 3-word SHINGLE set, not the token set:
    * token-set Jaccard saturates on template corpora (shared vocabulary
    * ⇒ candidates approach batch×corpus — measured 10× slower on the
    * synthetic corpus), while shingles only collide on preserved local
    * word order. Pass `tokensOf` to override — unlike the index-backed
    * variants there is no `tokensTag` here: the inline path derives
    * every artifact from `tokensOf` within one call and persists
    * nothing, so there is no stored stamp for a tag to name.
    *
    * The narrow batch frame (id, fingerprint, token set) materializes
    * ONCE via a (lazy) local checkpoint: it feeds three broadcasts
    * (exact fingerprints, band rows, verify token sets) that would
    * otherwise EACH re-run the batch scan + md5 + shingle pipeline —
    * subplans don't reuse across consumers, only exchanges do. A
    * localCheckpoint rather than persist() on purpose: an internal
    * persist has no unpersist hook, and CacheManager holds cached
    * frames until session end — one leaked ingest-batch cache per call
    * in a long-lived ingest loop — while checkpoint blocks are
    * reference-tracked and reclaimed by the ContextCleaner once the
    * returned flags frame is dropped. Trade-off: lineage truncation
    * means an executor loss fails the ingest job instead of
    * recomputing (rerun the batch; flags are deterministic).
    */
  /** Auto-regime boundary for [[crossDedupFlags]]: estimated batch
    * shingle-frame bytes above this pick the shuffle regime. 256 MiB
    * against the measured failure boundary — ~600 MB of shingle frames
    * (4M-doc corpus, 400k-doc batch) killed the broadcast build twice
    * (DOCS_4m_r13/r14) — with 2× headroom for the driver holding up to
    * three batch-derived broadcasts concurrently and for per-executor
    * copies on a real cluster's 8-16 GB executors.
    */
  val BroadcastShingleMaxBytes: Long = 256L << 20

  def crossDedupFlags(batch: DataFrame, corpus: DataFrame,
      textCol: String, idCol: String, numHashes: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.3,
      tokensOf: Column => Column = wordShingles(_, 3),
      broadcastBatch: Option[Boolean] = None,
      broadcastMaxBytes: Long = BroadcastShingleMaxBytes): DataFrame = {
    require(numHashes > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must split evenly into $bands bands")
    // The broadcast regime BOUNDS the batch: its (id, fp, toks) frame
    // must fit in the driver and every executor — the production ingest
    // shape (a bounded arrival batch vs an unbounded corpus). A batch
    // that GROWS with the corpus (a fixed fraction, a backfill) blows
    // the broadcast build — measured at 4M docs / 400k-doc batch
    // (~600 MB of shingle frames, DOCS_4m_r13 AND r14) — where the
    // shuffle regime swaps every batch-side broadcast for a plain
    // shuffle equi-join: the corpus shuffles too (that is the price of
    // a corpus-sized batch), but nothing must fit whole anywhere.
    // Flags are identical either way (q130 shares q104's oracle).
    //
    // `broadcastBatch = Some(x)` forces a regime; the None default
    // AUTO-selects: one narrow batch-sided agg (row count + text chars)
    // estimates the dominant broadcast — the shingle frame, ~3× the
    // text (every word lands in ~3 three-word shingles) plus per-row
    // array overhead — and estimates above `broadcastMaxBytes` take
    // the shuffle regime. The estimate costs one extra batch scan
    // (batch-sized, i.e. exactly the quantity being bounded), and is
    // deliberately coarse: chars ≈ bytes and the 3× multiplier assume
    // the default `wordShingles(_, 3)` tokenizer; a custom `tokensOf`
    // with very different expansion should force its regime explicitly.
    val useBroadcast = broadcastBatch.getOrElse {
      val est = batch.agg(count(lit(1)),
        coalesce(sum(length(col(textCol))), lit(0L))).head
      val rows = est.getLong(0)
      val estShingleBytes = est.getLong(1) * 3L + rows * 64L
      val pick = estShingleBytes <= broadcastMaxBytes
      System.err.println(s"[graft] crossDedupFlags auto regime: ~" +
        s"${estShingleBytes >> 20} MiB estimated shingle frame for " +
        s"$rows batch rows -> ${if (pick) "broadcast" else "shuffle"}")
      pick
    }
    val maybeBc: DataFrame => DataFrame =
      if (useBroadcast) broadcast else identity
    val bToks = batch.select(col(idCol).as("id"),
      fingerprint(col(textCol)).as("fp"), tokensOf(col(textCol)).as("toks"))
      .localCheckpoint(false)
    // exact: corpus scan, broadcast batch fingerprints, semi-join
    val exactIds = corpus
      .select(fingerprint(col(textCol)).as("fp"))
      .join(maybeBc(bToks.select(col("id"), col("fp"))), Seq("fp"))
      .select(col("id")).distinct()
    // near: corpus band rows ⋈ broadcast batch band rows
    val cBands = bandRowsOf(corpus, tokensOf(col(textCol)), idCol,
      numHashes, bands)
    val bBands = bandRowsOf(bToks, col("toks"), "id", numHashes, bands)
    val cands = cBands
      .join(maybeBc(bBands.withColumnRenamed("id", "bid")),
        Seq("band", "band_sig"))
      .select(col("bid"), col("id").as("cid")).distinct()
    // verify: corpus token sets stay map-side (broadcast the candidate
    // ids to prune the scan, then the batch token sets to score). The
    // candidate join runs BEFORE the shingle projection — Catalyst has
    // no rule to push a join below a projection, so ordering it here is
    // what keeps the shingle+md5 work off the non-candidate rows.
    val verified = corpus
      .select(col(idCol).as("cid"), col(textCol))
      .join(maybeBc(cands), Seq("cid"))
      .select(col("cid"), col("bid"), tokensOf(col(textCol)).as("ctoks"))
      .join(maybeBc(bToks.select(col("id").as("bid"),
        col("toks").as("btoks"))), Seq("bid"))
    assembleFlags(batch, idCol, exactIds, jaccardNearIds(verified,
      minJaccard))
  }

  /** Exact-Jaccard verification over candidate pairs carrying both
    * token sets as (bid, btoks, cid, ctoks) rows → batch ids that have
    * at least one corpus neighbor at `minJaccard`.
    */
  private def jaccardNearIds(verified: DataFrame, minJaccard: Double)
  : DataFrame = {
    val inter = size(array_intersect(col("btoks"), col("ctoks")))
    verified
      .select(col("bid"),
        (inter / (size(col("btoks")) + size(col("ctoks")) - inter)
          .cast("double")).as("j"))
      .filter(round(col("j"), 4) >= minJaccard)
      .select(col("bid").as("id")).distinct()
  }

  private def assembleFlags(batch: DataFrame, idCol: String,
      exactIds: DataFrame, nearIds: DataFrame): DataFrame =
    batch.select(col(idCol).as("id"))
      .join(exactIds.withColumn("exact_dup", lit(true)), Seq("id"), "left")
      .join(nearIds.withColumn("near_dup", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("near_dup"), lit(false)).as("near_dup"))

  /** The narrow per-document corpus profile `(id, fp, toks)` every
    * index derives from — ONE text scan + shingle pipeline. For big
    * corpora, persist THIS once and build the indexes from the reload
    * ([[corpusIndexesFromProfile]]); deriving the three indexes
    * straight from text ([[corpusIndexes]]) re-runs the scan per
    * artifact.
    */
  def corpusProfile(corpus: DataFrame, textCol: String, idCol: String,
      tokensOf: Column => Column = wordShingles(_, 3)): DataFrame =
    corpus.select(col(idCol).as("id"),
      fingerprint(col(textCol)).as("fp"), tokensOf(col(textCol)).as("toks"))

  /** The three corpus-side artifacts [[crossDedupFlags]] derives
    * inline, as frames to persist once per corpus build: fingerprints
    * `(id, fp)`, the near-dup band index `(id, band, band_sig,
    * _params)` (write it `partitionBy("band")` — pruning proven in
    * PlanRegressionSpec), and token sets `(id, toks)`. ONE canonical
    * derivation so [[crossDedupFlagsFromIndexes]] is flag-identical to
    * the inline path by construction. The band frame carries a constant
    * `_params` column stamping (numHashes, bands, tokenizer tag): a
    * lookup run with different banding than the index was built with
    * would otherwise return silently-empty candidates — the stamp
    * turns that into a loud runtime error.
    *
    * `tokensTag` names the TOKENIZER in the stamp: band signatures
    * from different token spaces never collide either, so an index
    * built under one `tokensOf` and looked up (or appended to) under
    * another is the same silent-empty failure — and a function can't
    * be hashed, so the contract is label-based: pass a distinct tag
    * whenever you pass a non-default `tokensOf`. The default tag
    * names the default `wordShingles(_, 3)`.
    */
  def corpusIndexesFromProfile(profile: DataFrame, numHashes: Int = 16,
      bands: Int = 4, tokensTag: String = "ws3")
  : (DataFrame, DataFrame, DataFrame) = {
    require(numHashes > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must split evenly into $bands bands")
    (profile.select(col("id"), col("fp")),
      bandRowsOf(profile, col("toks"), "id", numHashes, bands)
        .withColumn("_params",
          lit(bandParams(numHashes, bands, tokensTag))),
      profile.select(col("id"), col("toks")))
  }

  /** [[corpusIndexesFromProfile]] over raw corpus text. Each returned
    * frame re-derives the profile when materialized (three text scans
    * at build time) — stage [[corpusProfile]] to storage first when
    * build I/O matters. `tokensTag` must change with `tokensOf`
    * (label-based tokenizer identity — see
    * [[corpusIndexesFromProfile]]).
    */
  def corpusIndexes(corpus: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 16, bands: Int = 4,
      tokensOf: Column => Column = wordShingles(_, 3),
      tokensTag: String = "ws3")
  : (DataFrame, DataFrame, DataFrame) =
    corpusIndexesFromProfile(corpusProfile(corpus, textCol, idCol,
      tokensOf), numHashes, bands, tokensTag)

  private def bandParams(numHashes: Int, bands: Int,
      tokensTag: String = "ws3"): String =
    s"mh$numHashes/b$bands/$tokensTag"

  /** Stamps a lookup/append under (numHashes, bands, tokensTag)
    * ACCEPTS: the current three-field format, plus — when `tokensTag`
    * is the default "ws3" — the two-field `mh<n>/b<b>` format written
    * before the stamp named its tokenizer. Every pre-tag layout was
    * necessarily built with the default `wordShingles(_, 3)` (the tag
    * was introduced WITH the first non-default tokenizer support), so
    * the two-field stamp identifies the same banding family and
    * refusing it would orphan existing layouts for no safety gain; a
    * NON-default tag never matches a legacy stamp — the legacy layout
    * cannot prove its tokenizer, which is exactly the mismatch the
    * stamp exists to catch.
    */
  private def acceptedBandParams(numHashes: Int, bands: Int,
      tokensTag: String): Seq[String] =
    Seq(bandParams(numHashes, bands, tokensTag)) ++
      (if (tokensTag == "ws3") Seq(s"mh$numHashes/b$bands") else Nil)

  /** Build AND persist the [[corpusIndexes]] triple under one root —
    * `dir/fp` (fingerprints), `dir/band` (`partitionBy("band")` with
    * the banding-params stamp + O(1) sidecar), `dir/tok` (token sets)
    * — the text-dedup analog of [[Similarity.ivfIndexWrite]], so the
    * index family gets the same managed lifecycle the ANN family has
    * (write → append → compact) instead of leaving persistence
    * conventions to each caller. One text pass: the shared profile is
    * staged to `dir/_profile_tmp` and deleted after the three
    * projections commit (the in-memory alternative caches corpus-scale
    * text on executors).
    */
  def corpusIndexesWrite(corpus: DataFrame, textCol: String,
      idCol: String, dir: String, numHashes: Int = 16, bands: Int = 4,
      tokensOf: Column => Column = wordShingles(_, 3),
      tokensTag: String = "ws3"): Unit = {
    val spark = corpus.sparkSession
    val profDir = s"$dir/_profile_tmp"
    corpusProfile(corpus, textCol, idCol, tokensOf)
      .write.mode("overwrite").parquet(profDir)
    val (fpI, bandI, tokI) = corpusIndexesFromProfile(
      spark.read.parquet(profDir), numHashes, bands, tokensTag)
    // the three projections read the SAME staged profile and write
    // DISJOINT trees — overlapped so each write's task tail and commit
    // back-fill the others (guide §2.6); the sidecar stays strictly
    // after the band data it stamps
    graft.io.ParallelActions.run(Seq(
      () => fpI.write.mode("overwrite").parquet(s"$dir/fp"),
      () => bandI.write.partitionBy("band").mode("overwrite")
        .parquet(s"$dir/band"),
      () => tokI.write.mode("overwrite").parquet(s"$dir/tok")))
    Similarity.writeStampSidecar(spark, s"$dir/band",
      bandParams(numHashes, bands, tokensTag))
    val (fs, p) = {
      val pp = new org.apache.hadoop.fs.Path(profDir)
      (pp.getFileSystem(spark.sessionState.newHadoopConf()), pp)
    }
    fs.delete(p, true): Unit
  }

  /** Reload a [[corpusIndexesWrite]] layout as the
    * (fingerprints, bandIndex, tokenSets) triple
    * [[crossDedupFlagsFromIndexes]] consumes.
    */
  def corpusIndexesRead(spark: org.apache.spark.sql.SparkSession,
      dir: String)
  : (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/fp"),
      spark.read.parquet(s"$dir/band"),
      spark.read.parquet(s"$dir/tok"))

  /** Incremental append to a persisted [[corpusIndexesWrite]] layout —
    * the ingest path of the text-dedup index family, mirroring
    * [[Similarity.ivfIndexAppend]]: the new docs' artifacts are derived
    * in ONE batch-sized text pass and appended; the existing indexes
    * are never read beyond the O(1) band-stamp check and never
    * rewritten. A layout built under different banding params refuses
    * BEFORE any write (mismatched banding silently matches nothing —
    * the failure the stamp exists for).
    *
    * Failure atomicity: the stamp check precedes all writes, and the
    * band tree is appended FIRST; a crash between appends leaves the
    * batch partially visible, and every partial state only MISSES the
    * new docs (an fp/tok row without band rows — or band rows whose
    * token sets are absent — drops candidates, never fabricates
    * matches), the same degraded-to-missing contract as any
    * not-yet-ingested batch. Re-running the append repairs it
    * (duplicate index rows change no flags: candidates are
    * `.distinct()`-ed and the verify join is per-(bid, cid)).
    *
    * Band-tree fragmentation from a micro-batch loop is the same
    * cell-directory problem as the IVF index;
    * `Similarity.compactCells(spark, s"$dir/band", n, "band")` is the
    * identical cure (layout-agnostic, spec-proven).
    */
  def corpusIndexesAppend(newDocs: DataFrame, textCol: String,
      idCol: String, dir: String, numHashes: Int = 16, bands: Int = 4,
      tokensOf: Column => Column = wordShingles(_, 3),
      tokensTag: String = "ws3"): Unit = {
    val prof = corpusProfile(newDocs, textCol, idCol, tokensOf)
      .localCheckpoint(false) // batch-sized: one text pass feeds all three
    val (fpI, bandI, tokI) = corpusIndexesFromProfile(prof,
      numHashes, bands, tokensTag)
    // appending to a LEGACY layout (two-field pre-tokenizer-tag stamp,
    // accepted under the default tag — [[acceptedBandParams]]): verify
    // against and stamp the new rows with the layout's OWN stamp, so
    // the tree stays stamp-homogeneous instead of mixing formats
    val layoutStamp = Similarity.readStampSidecar(
      newDocs.sparkSession, s"$dir/band")
      .filter(acceptedBandParams(numHashes, bands, tokensTag).contains)
      .getOrElse(bandParams(numHashes, bands, tokensTag))
    Similarity.appendToStampedLayout(
      bandI.withColumn("_params", lit(layoutStamp)), s"$dir/band",
      layoutStamp, "corpusIndexesAppend",
      partitionCol = "band",
      desc = "band index built under different banding params")
    fpI.write.mode("append").parquet(s"$dir/fp")
    tokI.write.mode("append").parquet(s"$dir/tok")
  }

  /** Managed RE-BANDING migration — [[Similarity.rebuildUnderCodebook]]
    * for the text-dedup index family, completing its lifecycle (build →
    * append → compact → REBUILD-UNDER-NEW-PARAMS → cut over): the path
    * out of the refusal [[corpusIndexesAppend]] and
    * [[crossDedupFlagsFromIndexes]] correctly give mismatched
    * (numHashes, bands), which until r17 was "new root by hand".
    *
    * Source of truth is the old layout's TOK tree: token sets are
    * banding-INDEPENDENT, so the new band tree re-derives from them in
    * one staged pass with zero passes over corpus text — the tok tree
    * is the text index family's "decode side", exactly as the vector
    * twin is the IVF-PQ pair's. The fp tree copies unchanged
    * (fingerprints don't band). Consequently the TOKENIZER cannot
    * change here: the persisted toks were computed under the old
    * `tokensOf`, and new-shingle token sets simply do not exist in the
    * layout — a `tokensTag` differing from the old layout's stamp
    * refuses with the pointer to [[corpusIndexesWrite]] over text (the
    * unavoidable re-tokenization pass).
    *
    * Input tolerance mirrors the vector-side migration: a
    * [[corpusIndexesWrite]] layout or a STREAMING `_batch=`-keyed
    * [[graft.streaming.IdempotentSink.dedupIngestByBatch]] root (the
    * stream-graduation path — extra partition columns are projected
    * away; the output is always a BATCH layout, a continuing stream
    * starts a fresh ingest root). The old layout's tag is read from
    * the band sidecar, falling back to the in-data `_params` distinct
    * (streaming roots write no sidecar); a stampless layout is flagged
    * on stderr rather than silently trusted.
    *
    * CRASH CONTRACT (resumable by re-run, sidecar-last): the new band
    * sidecar is the completion marker — present+matching no-ops
    * (idempotent resume), present+different refuses (complete foreign
    * layout), absent over data files is a crashed partial that the
    * overwrite-mode writes replace wholesale. Don't cut readers over
    * before this returns. A PENDING compaction swap at any of the old
    * root's trees refuses — mid-swap, some partitions' only copy lives
    * in the temp tree and the rebuild would silently drop their rows.
    * Write order: tok first, band DERIVED FROM THE PERSISTED NEW TOK
    * TREE (the pair-build convention — the two trees agree by
    * construction), fp, sidecar. Returns the new band stamp.
    */
  def rebuildUnderBandParams(spark: org.apache.spark.sql.SparkSession,
      oldRoot: String, newRoot: String, numHashes: Int = 16,
      bands: Int = 4, tokensTag: String = "ws3"): String = {
    require(numHashes > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must split evenly into $bands bands")
    require(newRoot != oldRoot,
      "rebuildUnderBandParams: in-place migration is impossible by " +
        "design (every band row changes) — pass a fresh newRoot and " +
        "cut over after this returns")
    val newStamp = bandParams(numHashes, bands, tokensTag)
    val conf = spark.sessionState.newHadoopConf()
    // pending compaction swaps at ANY old tree refuse: mid-swap, the
    // temp tree holds some partitions' only copy
    Seq("fp", "band", "tok").foreach { tree =>
      val p = new org.apache.hadoop.fs.Path(s"$oldRoot/$tree")
      val fs = p.getFileSystem(conf)
      val pending = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(
          p.getParent, p.getName + "_compact_tmp"),
        graft.streaming.IdempotentSink.FoldManifest)
      if (fs.exists(pending))
        throw new IllegalStateException(
          s"rebuildUnderBandParams: $oldRoot/$tree has a pending " +
            "compaction swap — finish it first (some partitions' only " +
            "copy is in the temp tree; rebuilding now would drop " +
            "their rows)")
      if (tree != "band") // band may legitimately be absent mid-crash
        require(graft.io.FsUtil.hasDataFiles(fs, p),
          s"rebuildUnderBandParams: no data files under $oldRoot/$tree " +
            "— migrating a never-built or truncated layout must fail, " +
            "not produce an empty index that matches nothing")
    }
    // the old layout's tokenizer identity: sidecar, else the in-data
    // _params distinct (streaming roots write no sidecar)
    val oldStamp = Similarity.readStampSidecar(spark, s"$oldRoot/band")
      .orElse {
        val bandP = new org.apache.hadoop.fs.Path(s"$oldRoot/band")
        val bandFs = bandP.getFileSystem(conf)
        if (!graft.io.FsUtil.hasDataFiles(bandFs, bandP)) None
        else {
          val old = spark.read.parquet(s"$oldRoot/band")
          if (!old.columns.contains("_params")) None
          else {
            val stamps = old.select(col("_params")).distinct().collect()
              .map(r => Option(r.getString(0)).getOrElse("<null>"))
              .toSeq.sorted
            if (stamps.size > 1) throw new IllegalStateException(
              "rebuildUnderBandParams: the old band tree mixes stamps " +
                s"(${stamps.mkString(", ")}) — repair it before " +
                "migrating")
            stamps.headOption
          }
        }
      }
    oldStamp match {
      case Some(s) =>
        val oldTag = s.split("/").lift(2).getOrElse("ws3")
        if (oldTag != tokensTag) throw new IllegalStateException(
          "rebuildUnderBandParams: the old layout's token sets were " +
            s"built under tokenizer '$oldTag', this migration targets " +
            s"'$tokensTag' — re-banding re-derives from PERSISTED token " +
            "sets, and a tokenizer change invalidates them. Rebuild " +
            "from corpus text with corpusIndexesWrite.")
      case None =>
        System.err.println(
          "[graft] rebuildUnderBandParams: old layout carries no band " +
            s"stamp — cannot verify its tokenizer matches '$tokensTag'; " +
            "a mismatch silently bands foreign token sets.")
    }
    Similarity.readStampSidecar(spark, s"$newRoot/band").foreach { s =>
      if (s == newStamp) {
        System.err.println(s"[graft] rebuildUnderBandParams: $newRoot " +
          s"already carries stamp $newStamp — nothing to do")
        return newStamp
      }
      throw new IllegalStateException(
        s"rebuildUnderBandParams: $newRoot already holds a COMPLETE " +
          s"layout under different banding params (sidecar $s, this " +
          s"migration targets $newStamp) — refusing to overwrite it; " +
          "pick a fresh root")
    }
    // tok first (one projected pass over the old tree — `_batch` and
    // friends dropped), then band from the PERSISTED new tok tree;
    // the fp copy has no ordering contract against either (only the
    // sidecar is ordering-sensitive: last), so it overlaps the
    // tok→band chain (guide §2.6) — a crash still leaves only
    // sidecar-less partial trees, which a re-run overwrites
    graft.io.ParallelActions.run(Seq(
      () => {
        spark.read.parquet(s"$oldRoot/tok")
          .select(col("id"), col("toks"))
          .write.mode("overwrite").parquet(s"$newRoot/tok")
        bandRowsOf(spark.read.parquet(s"$newRoot/tok"), col("toks"),
          "id", numHashes, bands)
          .withColumn("_params", lit(newStamp))
          .write.partitionBy("band").mode("overwrite")
          .parquet(s"$newRoot/band")
      },
      () => spark.read.parquet(s"$oldRoot/fp")
        .select(col("id"), col("fp"))
        .write.mode("overwrite").parquet(s"$newRoot/fp")))
    Similarity.writeStampSidecar(spark, s"$newRoot/band", newStamp)
    newStamp
  }

  /** The amortized ingest path — [[crossDedupFlags]] with the corpus
    * artifacts read from their persisted [[corpusIndexes]] instead of
    * re-derived per batch: ZERO passes over corpus text (the inline
    * path pays three). Same flags (DedupSpec asserts parity); every
    * index-side join still probes with a broadcast batch side, so the
    * corpus-scale indexes never shuffle, and a `partitionBy("band")`
    * band index prunes to the probed bands.
    */
  def crossDedupFlagsFromIndexes(batch: DataFrame, textCol: String,
      idCol: String, fpIndex: DataFrame, bandIdx: DataFrame,
      tokenIndex: DataFrame, numHashes: Int = 16, bands: Int = 4,
      minJaccard: Double = 0.3,
      tokensOf: Column => Column = wordShingles(_, 3),
      tokensTag: String = "ws3"): DataFrame = {
    require(numHashes > 0 && numHashes % bands == 0,
      s"numHashes ($numHashes) must split evenly into $bands bands")
    val bToks = batch.select(col(idCol).as("id"),
      fingerprint(col(textCol)).as("fp"), tokensOf(col(textCol)).as("toks"))
      .localCheckpoint(false)
    val exactIds = fpIndex.select(col("fp"))
      .join(broadcast(bToks.select(col("id"), col("fp"))), Seq("fp"))
      .select(col("id")).distinct()
    // a lookup banded differently than the stored index silently finds
    // nothing (band_sig strings never collide). Fast path: a
    // corpusIndexesWrite layout carries an O(1) sidecar stamp — one
    // driver-side read verifies the whole layout regardless of how
    // many append batches it accumulated (mismatch throws BEFORE any
    // plan is built). Otherwise, if the index carries its in-data
    // build stamp, force-verify it per row; a stampless index
    // (hand-built or bandRowsOf-era) can't be verified, so flag it
    // loudly rather than reintroducing the silent-empty failure mode
    val accepted = acceptedBandParams(numHashes, bands, tokensTag)
    val sidecar = Similarity.singleRootOf(bandIdx)
      .flatMap(root => Similarity.readStampSidecar(
        bandIdx.sparkSession, root))
    sidecar.foreach { s =>
      if (!accepted.contains(s)) throw new IllegalStateException(
        "crossDedupFlagsFromIndexes: band index built under different " +
          s"banding params than this lookup (expected one of " +
          s"${accepted.mkString(" | ")}, sidecar has $s)")
    }
    val checkedIdx =
      if (sidecar.isDefined) {
        if (bandIdx.columns.contains("_params")) bandIdx.drop("_params")
        else bandIdx
      }
      else if (!bandIdx.columns.contains("_params")) {
        System.err.println(
          "[graft] crossDedupFlagsFromIndexes: band index has no _params " +
            s"build stamp — cannot verify it was built with " +
            s"${bandParams(numHashes, bands, tokensTag)}; a mismatched " +
            "banding/tokenizer " +
            "silently matches nothing. Build indexes with " +
            "buildDedupIndexes to get the stamp.")
        bandIdx
      }
      else bandIdx
        .filter(assert_true(
          col("_params").isin(accepted: _*),
          concat(lit("band index built with different params than this " +
            s"lookup (expected one of ${accepted.mkString(" | ")},"
            + " index has "), col("_params"), lit(")"))).isNull)
        .drop("_params")
    val bBands = bandRowsOf(bToks, col("toks"), "id", numHashes, bands)
    val cands = checkedIdx
      .join(broadcast(bBands.withColumnRenamed("id", "bid")),
        Seq("band", "band_sig"))
      .select(col("bid"), col("id").as("cid")).distinct()
    val verified = tokenIndex
      .select(col("id").as("cid"), col("toks").as("ctoks"))
      .join(broadcast(cands), Seq("cid"))
      .join(broadcast(bToks.select(col("id").as("bid"),
        col("toks").as("btoks"))), Seq("bid"))
    assembleFlags(batch, idCol, exactIds, jaccardNearIds(verified,
      minJaccard))
  }

  /** Connected components over a near-dup pair graph by min-label
    * propagation: every node's label converges to the smallest id
    * reachable from it, so a component is named by its smallest member —
    * the canonical dup-GROUP clustering when keep/drop decisions need
    * whole groups (the pairwise greedy drop of [[minhashBandPairsOver]]
    * consumers can split a transitive chain a←b←c into inconsistent
    * decisions; components cannot).
    *
    * Scale shape: the edge list (derived from the expensive banding
    * pipeline) is persisted once, so each iteration pays ONE hash
    * shuffle (neighbor-label join + min agg) over cached edges —
    * without the persist every iteration would re-run the whole
    * MinHash/verify pipeline. The loop early-stops on a converged
    * iteration via a bounded driver-side count — the same documented
    * driver-action pattern as [[Similarity]]'s kmeansIterate — and
    * throws if `maxIters` rounds did not converge (silently returning
    * partial labels would split components, the exact inconsistency
    * this operator exists to prevent).
    *
    * CONVERGENCE CONTRACT: rounds-to-converge = O(component DIAMETER),
    * not corpus size — plus one final all-stable round to observe
    * convergence. Near-dup clusters in real corpora are template
    * families, star/clique-shaped with diameter ≤ ~3, so the loop is
    * a handful of rounds at ANY corpus size (measured on the 4M-doc
    * grown corpus: 4 rounds — 3 changing + 1 stability-observation —
    * per-round wall flat; DOCS_4m_r14 /
    * SCALE_r14 §4; per-round changed-counts and walls log under
    * GRAFT_CC_LOG=1). The adversary is a CHAIN-shaped graph
    * (a~b~c~…~z, diameter = n): min-label propagation needs O(n)
    * rounds there, and `maxIters` exists to turn that pathology into a
    * loud error instead of an unbounded driver loop. A corpus whose
    * near-dup graph legitimately carries long chains wants a
    * pointer-doubling variant (labels propagate along label-graph
    * edges, O(log diameter) rounds at ~2× per-round cost) — not
    * needed for the template-family regime this engine targets.
    *
    * Returns (id, rep): one row per node of the pair graph (isolated
    * docs never enter; their "component" is trivially themselves). The
    * API owns every cache it creates: the converged labels are
    * materialized once via an eager `localCheckpoint` (same pattern as
    * [[crossDedupFlags]]'s batch frame) and every intermediate persist
    * is dropped before returning, so no CacheManager entry escapes —
    * the checkpoint blocks are reclaimed by the ContextCleaner when the
    * returned frame goes unreferenced, with no caller-side `unpersist()`
    * obligation (the round-6 foot-gun).
    */
  /** Iteration count of the most recent connectedComponents /
    * connectedComponentsFast call that CONVERGED — a driver-side bench
    * hook (CcBench records rounds × per-round wall without parsing the
    * GRAFT_CC_LOG stderr). Last-writer-wins under concurrency; never
    * read it for correctness.
    */
  @volatile private[graft] var lastCcRounds: Int = 0

  def connectedComponents(pairs: DataFrame, maxIters: Int = 20)
  : DataFrame = {
    // edges persist for the one-time setup, not the loop: `closed`
    // references edges TWICE (the union below) and the initial labels
    // scan it once more — unpersisted, each consumer re-runs the full
    // upstream MinHash/verify pairs pipeline before closed's own cache
    // populates (~2-3× one-time setup cost, the r14 advice finding).
    // Dropped right after the first materialization below.
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionByName(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .persist()
    // self-loops CLOSE the neighborhood so each round is ONE join+agg
    // with labels referenced ONCE. The former round shape —
    // union(neighbor-min join, own labels) — referenced labels TWICE,
    // doubling the LOGICAL plan per round: invisible at the
    // template-family diameter (≤4 rounds ⇒ ≤16 copies) but a
    // diameter-16 random graph OOM'd plan stringification at 2¹⁶
    // copies before maxIters could fire (found by the r14 differential
    // sweep). Same semantics: min over the closed neighborhood.
    val closed = edges.unionByName(
      edges.select(col("a"), col("a").as("b")).distinct()).persist()
    // per-round labels are lineage-truncated (eager localCheckpoint):
    // persist alone caches DATA but leaves the logical tree growing
    // with every round, and the checkpoint also sidesteps Catalyst's
    // union-constraint rewrite bug that a union over a checkpointed
    // frame trips (see connectedComponentsFast). Derived from `closed`
    // (node set is identical — self-loops add no ids), so this eager
    // materialization also populates closed's cache, after which the
    // edges cache has no further reader.
    // labels init = the SELF-LOOP rows of closed (b === a), which ARE
    // the distinct node set by construction — the former
    // `closed.select(a).distinct()` paid a second corpus-wide
    // exchange+agg for a set the closed union already materializes
    // (r19). The filter scans closed once, so this eager checkpoint
    // still populates closed's cache, after which the edges cache has
    // no further reader. (Self-edges in caller-supplied pairs can
    // duplicate an init row; the first round's groupBy(id) collapses
    // them — labels after any round are unique per id.)
    var labels = closed.filter(col("b") === col("a"))
      .select(col("a").as("id"), col("a").as("rep")).localCheckpoint(true)
    edges.unpersist()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val t0 = System.nanoTime()
      // the self-loop row (a,a) carries a's OWN current label through
      // the join, so the same aggregate that takes the neighborhood min
      // also recovers the pre-round label — and convergence (no label
      // shrank) rides the checkpoint MATERIALIZATION job itself as an
      // Observation (r19; min(rep) ≤ _old always since the self row
      // participates in the min, so `changed` counts exactly the rows
      // the r18 filter+count — and the pre-r18 propagated⋈labels join —
      // counted). One exchange AND one job per plain round: the
      // separate count action over the checkpointed blocks was pure
      // job-dispatch overhead per round — one extra full-label pass
      // per round at 10⁹ nodes.
      val obs = org.apache.spark.sql.Observation()
      val prop0 = closed.join(labels, closed("b") === labels("id"))
        .select(closed("a").as("id"),
          (closed("b") === closed("a")).as("_self"), col("rep"))
        .groupBy("id").agg(min(col("rep")).as("rep"),
          min(when(col("_self"), col("rep"))).as("_old"))
        .observe(obs,
          count(when(col("rep") < col("_old"), lit(1))).as("changed"))
        .localCheckpoint(true)
      val changed = obs.get("changed").asInstanceOf[Long]
      labels = prop0.select(col("id"), col("rep"))
      converged = changed == 0
      i += 1
      // scale-measurement hook (SCALE_r10/r14): per-iteration
      // label-change counts and round walls put the driver-loop cost
      // curve on record — opt-in via env so the gate's stderr stays
      // quiet
      if (sys.env.contains("GRAFT_CC_LOG"))
        System.err.println(f"[cc] iter $i changed=$changed " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    closed.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations " +
          "(component diameter exceeds maxIters); raise maxIters")
    lastCcRounds = i
    // the converged labels are already checkpoint-materialized; the
    // caller gets a plain frame with no unpersist obligation
    labels
  }

  /** [[connectedComponents]] with POINTER JUMPING — the chain-graph
    * escape the plain loop's scaladoc names: min-label propagation
    * alone needs O(diameter) rounds (a path a~b~…~z is the adversary),
    * while alternating each propagation with a label-shortcut round
    * (`rep(x) ← rep(rep(x))` — labels are themselves node ids, so the
    * label table self-joins as its own lookup) doubles the distance a
    * minimum travels per round: O(log diameter) rounds total, the
    * standard pointer-doubling argument (cf. hash-to-min, Rastogi et
    * al. 2012). Per round it pays TWO hash shuffles (the neighbor join
    * + the self-join) against the plain loop's one, so on the
    * template-family regime (diameter ≤ ~3) it is strictly MORE
    * expensive — use it when components can legitimately be long
    * chains (citation/link graphs, time-ordered revision chains), not
    * as a default.
    *
    * Correctness: both steps only DECREASE labels and both preserve
    * "label is the id of a node reachable from me" (neighbor labels
    * are reachable through the edge; `rep(rep(x))` is reachable
    * transitively), so labels are bounded below by the component min;
    * at a fixpoint every edge has equal labels at both ends (each end
    * ≤ the other) ⇒ labels are constant per component, and the min
    * node's own label can never move off itself ⇒ the constant is the
    * component min. Same convergence observation, cache ownership,
    * maxIters guard, and GRAFT_CC_LOG hook as the plain loop; DedupSpec
    * proves label-parity on the banded pair graph and convergence on a
    * chain 10× longer than its maxIters.
    */
  def connectedComponentsFast(pairs: DataFrame, maxIters: Int = 20)
  : DataFrame = {
    // persisted for the same one-time-setup reason as the plain loop:
    // closed's union reads edges twice and the initial labels once —
    // without the cache each re-runs the upstream pairs pipeline
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionByName(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .persist()
    // self-loops CLOSE the neighborhood once, outside the loop, so each
    // round's propagate is a single join+agg — the plain loop's
    // per-round `union(neighbor mins, own labels)` form is unusable
    // here: unioning against a checkpoint-truncated labels frame trips
    // Catalyst's union-constraint rewrite (AttributeMap lookup fails on
    // the join-side constraint attribute at planning)
    val closed = edges.unionByName(
      edges.select(col("a"), col("a").as("b")).distinct()).persist()
    // each round's labels are LINEAGE-TRUNCATED (eager localCheckpoint,
    // not persist): the jump step references the round's propagated
    // frame TWICE (both sides of the self-join), so under persist alone
    // the LOGICAL plan doubles every round — 2^rounds copies of the
    // base tree by round 10, an analyzer/optimizer OOM before any task
    // runs (measured: 8 GB heap dies at a 101-node chain). Checkpoint
    // blocks are reclaimed by the ContextCleaner as each round's frame
    // goes unreferenced, same ownership story as the plain loop's
    // returned frame. Derived from `closed` so this eager
    // materialization populates closed's cache; the edges cache is
    // done after it.
    // labels init = the SELF-LOOP rows of closed (b === a), which ARE
    // the distinct node set by construction — the former
    // `closed.select(a).distinct()` paid a second corpus-wide
    // exchange+agg for a set the closed union already materializes
    // (r19). The filter scans closed once, so this eager checkpoint
    // still populates closed's cache, after which the edges cache has
    // no further reader. (Self-edges in caller-supplied pairs can
    // duplicate an init row; the first round's groupBy(id) collapses
    // them — labels after any round are unique per id.)
    var labels = closed.filter(col("b") === col("a"))
      .select(col("a").as("id"), col("a").as("rep")).localCheckpoint(true)
    edges.unpersist()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val t0 = System.nanoTime()
      // propagate: everyone adopts the min label in their CLOSED
      // neighborhood (self-loops supply the own-label term).
      // Checkpointed before the self-join below — it is consumed twice.
      // The self row also recovers the PRE-round label (`_old`) in the
      // same aggregate — see the plain loop's round for the argument
      // (r18 optimization)
      val propagated = closed.join(labels, closed("b") === labels("id"))
        .select(closed("a").as("id"),
          (closed("b") === closed("a")).as("_self"), col("rep"))
        .groupBy("id").agg(min(col("rep")).as("rep"),
          min(when(col("_self"), col("rep"))).as("_old"))
        .localCheckpoint(true)
      // shortcut: follow the label one hop through the label table
      // itself — rep ids are node ids, so this is a self-join; a rep
      // that is already a component min maps to itself. `_old` rides
      // through: the jump only ever DECREASES rep further, so
      // rep < _old still counts exactly the changed rows — observed on
      // the jump checkpoint's own materialization job (r19; the
      // separate count action was one extra full-label pass per round)
      val obs = org.apache.spark.sql.Observation()
      val jumped = propagated.as("p")
        .join(propagated.select(col("id").as("rep"),
          col("rep").as("rep2")).as("q"), Seq("rep"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep"),
          col("_old"))
        .observe(obs,
          count(when(col("rep") < col("_old"), lit(1))).as("changed"))
        .localCheckpoint(true)
      val changed = obs.get("changed").asInstanceOf[Long]
      labels = jumped.select(col("id"), col("rep"))
      converged = changed == 0
      i += 1
      if (sys.env.contains("GRAFT_CC_LOG"))
        System.err.println(f"[cc-fast] iter $i changed=$changed " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    closed.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsFast did not converge in $maxIters " +
          "iterations (log₂ of the component diameter exceeds maxIters?); " +
          "raise maxIters")
    lastCcRounds = i
    labels
  }

  /** [[connectedComponents]] with the plain-vs-pointer-doubling regime
    * AUTO-selected — the third measured-boundary auto (after
    * crossDedupFlags' broadcast-vs-shuffle and decontaminateAuto's
    * exact-vs-bloom): the plain loop wins on template-family graphs
    * (diameter ≤ ~3, ONE shuffle/round — CC_1m_chain_r15 measured the
    * fast loop ~2.7× per round) while chains need the fast loop
    * (O(log d) vs O(d) rounds), and today the caller must know their
    * graph's shape to pick. This loop runs PLAIN rounds first and
    * switches to pointer-doubling only if convergence hasn't been
    * observed after `switchAfter` rounds — a diameter the caller never
    * sees costs nothing (template families converge before the switch
    * and pay exactly the plain loop), while a chain pays `switchAfter`
    * cheap rounds then finishes in O(log remaining-diameter).
    *
    * Interleaving is sound because BOTH round shapes preserve the two
    * invariants the fixpoint argument needs — labels only DECREASE and
    * every label is the id of a reachable node — so any mix converges,
    * and at `changed == 0` the propagate step alone was a no-op, which
    * is exactly the plain loop's fixpoint: labels constant per
    * component, pinned to the component min by the min node's own
    * immovable label. Labels produced mid-run by either shape are
    * valid input to the other.
    *
    * Same cache ownership, convergence observation, maxIters guard,
    * and GRAFT_CC_LOG hook as both fixed loops; q137 shares q107's
    * oracle verbatim, DedupSpec proves parity on the banded graph plus
    * chain convergence inside a budget the plain loop throws on, and
    * asserts the shallow case never pays a jump round
    * ([[lastCcRounds]] ≤ switchAfter).
    */
  def connectedComponentsAuto(pairs: DataFrame, switchAfter: Int = 4,
      maxIters: Int = 20): DataFrame = {
    require(switchAfter >= 1 && switchAfter <= maxIters,
      s"switchAfter ($switchAfter) must be in [1, maxIters=$maxIters]")
    val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
      .unionByName(pairs.select(col("id2").as("a"), col("id1").as("b")))
      .persist()
    val closed = edges.unionByName(
      edges.select(col("a"), col("a").as("b")).distinct()).persist()
    // labels init = the SELF-LOOP rows of closed (b === a), which ARE
    // the distinct node set by construction — the former
    // `closed.select(a).distinct()` paid a second corpus-wide
    // exchange+agg for a set the closed union already materializes
    // (r19). The filter scans closed once, so this eager checkpoint
    // still populates closed's cache, after which the edges cache has
    // no further reader. (Self-edges in caller-supplied pairs can
    // duplicate an init row; the first round's groupBy(id) collapses
    // them — labels after any round are unique per id.)
    var labels = closed.filter(col("b") === col("a"))
      .select(col("a").as("id"), col("a").as("rep")).localCheckpoint(true)
    edges.unpersist()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val t0 = System.nanoTime()
      val jump = i >= switchAfter
      // same fused convergence as the fixed loops: the self row
      // recovers the pre-round label in the propagate aggregate, and
      // `changed` rides the ROUND's last checkpoint materialization as
      // an Observation (r19) — one exchange and one job per plain
      // round, two per jump round (was +1 count job per round; and two
      // and three exchanges with the pre-r18 changed-check join)
      val obs = org.apache.spark.sql.Observation()
      def observed(df: DataFrame): DataFrame = df.observe(obs,
        count(when(col("rep") < col("_old"), lit(1))).as("changed"))
      val propagated0 = closed.join(labels, closed("b") === labels("id"))
        .select(closed("a").as("id"),
          (closed("b") === closed("a")).as("_self"), col("rep"))
        .groupBy("id").agg(min(col("rep")).as("rep"),
          min(when(col("_self"), col("rep"))).as("_old"))
      val next =
        if (!jump) observed(propagated0).localCheckpoint(true)
        else {
          val propagated = propagated0.localCheckpoint(true)
          observed(propagated.as("p")
            .join(propagated.select(col("id").as("rep"),
              col("rep").as("rep2")).as("q"), Seq("rep"), "left")
            .select(col("id"),
              least(col("rep"), coalesce(col("rep2"), col("rep")))
                .as("rep"), col("_old")))
            .localCheckpoint(true)
        }
      val changed = obs.get("changed").asInstanceOf[Long]
      labels = next.select(col("id"), col("rep"))
      converged = changed == 0
      i += 1
      if (sys.env.contains("GRAFT_CC_LOG"))
        System.err.println(f"[cc-auto] iter $i " +
          f"${if (jump) "jump" else "plain"} changed=$changed " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    closed.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsAuto did not converge in $maxIters " +
          "iterations; raise maxIters")
    lastCcRounds = i
    labels
  }

  /** Transitive-consistent keep/drop flags for every document: keep iff
    * the doc is its exact-dup group's keeper AND (it sits outside the
    * near-dup pair graph OR it is its component's min-id
    * representative). Pairwise greedy drop over raw pairs can split a
    * transitive a~b~c chain into inconsistent decisions; component
    * representatives cannot. The pair graph is between exact-dup
    * REPRESENTATIVES (the pair generators pre-collapse), so a dropped
    * representative also drops its exact-dup members — they were
    * already non-keepers.
    *
    * `pairs` is any (id1, id2) near-dup pair frame over the same id
    * space — [[simhashNeighbors64]] pairs make the flags an exact
    * function of the data (banding recall is total for hamming <
    * bands); MinHash-banded pairs give the LSH-probabilistic variant.
    * One broadcast-able join against the component labels (component
    * count ≤ paired-doc count ≪ corpus).
    *
    * '''Pair-source contract (load-bearing).''' `pairs` must link
    * exact-dup REPRESENTATIVES — ids that are also the min-id exact
    * keepers — which every pair generator in this object guarantees by
    * pre-collapsing on the normalized fingerprint. Pairs built over RAW
    * doc ids violate that: a component whose min-id node is itself an
    * exact-dup NON-keeper gets a representative with `_exact_keep =
    * false`, so `keep` is false for the representative AND for every
    * other member (they lose `rep === id`) — the whole group is
    * silently eliminated. The invariant is not checked at runtime (it
    * would cost a corpus-wide join per call); if you supply custom
    * pairs, pre-collapse them through [[keepersByKey]] first.
    */
  def componentDedupFlags(df: DataFrame, textCol: String, idCol: String,
      pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val comps = connectedComponents(pairs, maxIters)
      .withColumnRenamed("id", idCol)
    exactDedupFlags(df, textCol, idCol)
      .withColumnRenamed("keep", "_exact_keep")
      .join(comps, Seq(idCol), "left")
      .select(col(idCol),
        (col("_exact_keep") &&
          (col("rep").isNull || col("rep") === col(idCol))).as("keep"))
  }

  /** One-scan fused form of the default transitive-consistent flag
    * chain — identical output to
    * `componentDedupFlags(df, …, simhashNeighbors64(df, …))` (parity
    * spec in DedupSpec), different cost:
    *
    *  - The composed form scans the document TEXT twice (once for the
    *    pair pipeline's codes, once for [[exactDedupFlags]]) and pays
    *    the fingerprint-partitioned window shuffle twice (the banding
    *    pre-collapse and the exact flags are the same min-id window).
    *    At 100 TB the second text scan is another 100 TB of I/O.
    *  - This form computes the fingerprint AND the 64-bit shingle code
    *    in ONE pass (both are in-scan kernels), derives exact flags
    *    and the banding pre-collapse from ONE fingerprint window, and
    *    materializes that narrow (id, fp-derived flag, code) frame via
    *    an eager localCheckpoint — ~50 bytes/doc, the same
    *    narrow-index-for-text-scan trade [[corpusIndexes]] makes
    *    explicitly — so the text is read exactly once no matter how
    *    many downstream actions (component iterations + final join)
    *    consume it. Checkpoint blocks are reclaimed when the returned
    *    frame goes unreferenced, as in [[connectedComponents]].
    */
  def simhash64ComponentFlags(df: DataFrame, textCol: String,
      idCol: String, bandBits: Int = 16, maxHamming: Int = 2,
      maxBucket: Int = 4096, maxIters: Int = 20): DataFrame = {
    require(64 % bandBits == 0 && bandBits >= 1 && bandBits <= 32,
      s"bandBits ($bandBits) must divide 64 and leave ≥2 bands")
    val bands = 64 / bandBits
    require(maxHamming < bands,
      s"pigeonhole: $bands bands only guarantee recall for distance < $bands")
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    // ONE text pass: fingerprint + shingle code together
    val toks = wordShingles(col(textCol), 3)
    val coded = df.select(col(idCol).as("id"),
      fingerprint(col(textCol)).as("_fp"),
      when(size(toks) > 0,
        column(graft.functions.Simhash64Code(expression(toks))))
        .as("code"))
    // ONE fingerprint window: exact flags for every row; its min-id IS
    // the banding pre-collapse (keepersByKey's predicate)
    val flagged = coded
      .withColumn("_exact_keep", col("id") ===
        min(col("id")).over(Window.partitionBy(col("_fp"))))
      .drop("_fp")
      .localCheckpoint(true)
    val bandRows = simhash64BandRows(
      flagged.filter(col("_exact_keep") && col("code").isNotNull),
      bandBits)
    val comps = connectedComponents(
      bandedHammingPairs(bandRows, maxHamming, maxBucket), maxIters)
      .withColumnRenamed("id", "_cid")
    flagged.select(col("id").as(idCol), col("_exact_keep"))
      .join(comps, col(idCol) === col("_cid"), "left")
      .select(col(idCol),
        (col("_exact_keep") &&
          (col("rep").isNull || col("rep") === col(idCol))).as("keep"))
  }

  /** Token-set Jaccard similarity for id-adjacent pairs (a linear-cost
    * demonstration of the n-gram Jaccard kernel; the general pair source
    * is the MinHash band join). Inner-join semantics: pairs with empty
    * intersection are dropped.
    */
  def jaccardAdjacent(df: DataFrame, textCol: String, idCol: String)
  : DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokenSet(col(textCol))).as("tok"))
    val counts = toks.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = toks.as("a")
      .join(toks.as("b"),
        col("a.tok") === col("b.tok") &&
          col("b.id") === col("a.id") + 1)
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.withColumnRenamed("n", "n1"),
        col("id1") === col("id"))
      .drop("id")
      .join(counts.withColumnRenamed("n", "n2"),
        col("id2") === col("id"))
      .drop("id")
      .select(col("id1"), col("id2"),
        round(col("n_inter") /
          (col("n1") + col("n2") - col("n_inter")).cast("double"), 4)
          .as("jaccard"))
  }
}
