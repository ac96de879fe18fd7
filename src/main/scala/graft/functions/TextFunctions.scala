package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * normalization, tokenization, language-ID heuristics, quality scoring,
  * fingerprinting. All are pure `Column` expressions (whole-stage codegen,
  * no UDFs) so they inherit Catalyst pushdown/pruning and stay cheap at
  * 100 TB: every function is a scalar projection — no shuffle.
  *
  * Generalizes the reference's Hebrew text handling
  * (hebrew_alignment_tool.py:399-403 normalize;
  * convert_hebrew_grammar_pdf.py:95-133 token/QA checks).
  */
object TextFunctions {

  /** Lowercase, squeeze whitespace runs, trim — the match-key normalizer
    * (reference normalize, hebrew_alignment_tool.py:399-403).
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Non-empty whitespace tokens. */
  def tokens(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(Tokens(expression(c), distinct = false))
  }

  /** The Column-form executable spec of [[tokens]]/[[tokenSet]]
    * ([[TokenizeKernel]] runs in production — the HOF `filter` pays an
    * interpreted lambda per token; parity asserted in DedupSpec).
    */
  private[graft] def tokensHof(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** Distinct non-empty tokens (set semantics for dedup/Jaccard). */
  def tokenSet(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(Tokens(expression(c), distinct = true))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  def distinctTokenCount(c: Column): Column = size(tokenSet(c))

  /** Occurrence count of `word` as a standalone token — portable
    * (replace-based) so the DuckDB oracle matches exactly.
    */
  def wordHits(c: Column, word: String): Column = {
    val needle = s" $word "
    val padded = concat(lit(" "), c, lit(" "))
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) /
      needle.length).cast("long")
  }

  /** Stopword-hit language ID heuristic: counts per-language stopword
    * tokens; predicts the argmax with deterministic tie-break order
    * en > de > es > fr, 'und' for zero hits.
    */
  def langScores(c: Column): Map[String, Column] = Map(
    "en" -> (wordHits(c, "the") + wordHits(c, "and") + wordHits(c, "of")),
    "de" -> (wordHits(c, "der") + wordHits(c, "und") + wordHits(c, "die")),
    "es" -> (wordHits(c, "el") + wordHits(c, "la") + wordHits(c, "de")),
    "fr" -> (wordHits(c, "le") + wordHits(c, "et") + wordHits(c, "les")))

  /** Stopword-argmax language prediction with the deterministic
    * en > de > es > fr tie-break — the single source of the `when`
    * chain the curation/packing queries and their oracles mirror.
    */
  def predictedLang(c: Column): Column = {
    val sc = langScores(c)
    val (en, de, es, fr) = (sc("en"), sc("de"), sc("es"), sc("fr"))
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es").otherwise("fr")
  }

  /** Character-class ratio helpers for quality scoring. */
  def charClassCount(c: Column, clazz: String): Column =
    length(c) - length(regexp_replace(c, clazz, ""))

  /** Heuristic document quality in [0,1]: rewards length (saturating),
    * penalizes punctuation- and digit-heavy text. Pure arithmetic —
    * identical in DuckDB.
    */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c).cast("double")
    val punct = charClassCount(c, "[^a-zA-Z0-9 ]").cast("double")
    val digits = charClassCount(c, "[0-9]").cast("double")
    val lenScore = least(n / 50.0, lit(1.0))
    val punctPenalty = least(punct / greatest(length(c).cast("double"),
      lit(1.0)) * 5.0, lit(1.0))
    val digitPenalty = least(digits / greatest(length(c).cast("double"),
      lit(1.0)), lit(1.0))
    round(greatest(lit(0.0),
      lenScore - punctPenalty * 0.5 - digitPenalty * 0.2), 4)
  }

  /** Content fingerprint: md5 of the normalized text (exact-dup key) plus
    * a 64-char-prefix hash (head near-dup key).
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  def prefixFingerprint(c: Column, n: Int = 64): Column =
    md5(substring(normalizeText(c), 1, n))

  /** Hebrew-range character count (reference P5,
    * hebrew_alignment_transcription_fixed.py:505-519).
    */
  def hebrewCharCount(c: Column): Column =
    charClassCount(c, "[\\u0590-\\u05FF]")

  /** Word n-gram shingle set: overlapping n-token windows joined with a
    * space, distinct. The canonical MinHash unit for near-dup text:
    * token SETS ignore word order entirely; shingles preserve local
    * order, so reshuffled documents stop colliding. Computed with array
    * HOFs inline in the scan — no explode, no shuffle.
    */
  def wordShingles(c: Column, n: Int = 3): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(WordShingles(expression(c), n))
  }

  /** The Column-form executable spec of [[wordShingles]]
    * ([[TokenizeKernel.shingles]] runs in production; parity asserted
    * in DedupSpec — with one documented difference: this form returns
    * [] for NULL text via its array() binding trick, the kernel is
    * null-intolerant like every other scalar).
    */
  private[graft] def wordShinglesHof(c: Column, n: Int = 3): Column =
    // Bind the token array ONCE as a lambda variable before indexing it.
    // Referencing the token array directly inside the inner transform
    // would re-run the whole split+filter for every element_at call —
    // higher-order-function lambdas get no common-subexpression
    // elimination, so that shape is O(tokens²) per document (measured
    // 7 s for a 5k-doc scan that takes 0.4 s flat). A lambda variable
    // is a materialized value; every reference is an array read.
    element_at(transform(array(tokensHof(c)), ts => {
      val last = size(ts) - n
      array_distinct(
        when(last >= 0, transform(sequence(lit(0), last), i =>
          concat_ws(" ", (0 until n).map(j => element_at(ts, i + j + 1)): _*)))
          .otherwise(array().cast("array<string>")))
    }), 1)

  /** Winnowed rolling-hash document fingerprints (Schleimer et al.'s
    * winnowing, the MOSS fingerprint): polynomial k-gram hashes over the
    * normalized character stream, then the minimum of every w-hash
    * window, distinct. Robust to local edits — an insertion perturbs
    * only the windows it touches, so near-identical documents share most
    * fingerprints (unlike [[fingerprint]], which any edit flips).
    *
    * Zero shuffle, and portable: the DuckDB oracle derives identical
    * values (B=256, M=1e9+7, codepoint char codes). The default runs
    * the native codegen kernel ([[WinnowKernel]], ~12× the HOF form's
    * throughput); [[winnowedFingerprintsHof]] is the pure-Column
    * construction kept as the kernel's executable specification
    * (CurationSpec asserts bit-parity).
    */
  def winnowedFingerprints(c: Column, k: Int = 8, w: Int = 4): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    column(WinnowFingerprints(expression(normalizeText(c)), k, w))
  }

  /** The HOF reference construction of [[winnowedFingerprints]] — every
    * intermediate array (char codes, k-gram hashes) is bound as a
    * lambda variable before reuse — HOF lambdas get no CSE, so a naive
    * `val hashes = ...` referenced inside the winnow transform would
    * re-derive the entire hash array per window (measured 10× slower).
    */
  private[graft] def winnowedFingerprintsHof(c: Column, k: Int = 8,
      w: Int = 4): Column = {
    require(k > 0 && w > 0, "k and w must be positive")
    val B = 256L
    val M = 1000000007L
    val pows: Seq[Long] = {
      var p = 1L
      (0 until k).map { _ => val r = p; p = p * B % M; r }.reverse
    }
    val codesArr = transform(
      filter(split(normalizeText(c), ""), ch => ch =!= ""),
      ch => ascii(ch).cast("long"))
    val hashesArr = element_at(transform(array(codesArr), codes => {
      val last = size(codes) - k + 1
      when(lit(1) <= last,
        transform(sequence(lit(1), greatest(last, lit(1))), i =>
          pows.zipWithIndex.map { case (p, j) =>
            element_at(codes, i + j) * p
          }.reduce(_ + _) % M))
        .otherwise(array().cast("array<bigint>"))
    }), 1)
    element_at(transform(array(hashesArr), hs => {
      val nh = size(hs)
      val lastw = nh - w + 1
      when(nh === 0, array().cast("array<bigint>"))
        .when(lastw < 1, array(array_min(hs)))
        .otherwise(array_distinct(
          transform(sequence(lit(1), greatest(lastw, lit(1))), i =>
            array_min(slice(hs, i, lit(w))))))
    }), 1)
  }

  /** Deterministic hash bucket in [0, nBuckets) from a key column — the
    * train/val/test splitter and downsampler for training corpora.
    * Unlike `df.sample`/`rand`, membership is a pure function of the
    * KEY: stable across partitionings, re-runs, engines (DuckDB derives
    * the identical bucket via
    * `CAST('0x'||substring(md5(k),1,15) AS BIGINT) % n`), and incremental
    * ingests (a document keeps its split forever). First 60 bits of md5
    * — overflow-free in both engines, bias ≤ 2⁻⁴⁶ for sane nBuckets.
    * Pure projection: a split/sample at 100 TB is a pushable filter on
    * this column, not a shuffle.
    */
  def hashBucket(key: Column, nBuckets: Int = 100): Column = {
    require(nBuckets > 0, "nBuckets must be positive")
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") % nBuckets
  }
}
