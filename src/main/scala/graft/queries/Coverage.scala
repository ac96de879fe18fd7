package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Remaining operator-inventory coverage (SURVEY.md §2 rows without a
  * dedicated query elsewhere): P5 Hebrew-char count, W7 running average,
  * A10 per-group failure lists, cube grouping, BPE-ish token counting,
  * and embedding-cosine near-dup pairs.
  */
object Coverage {

  private val latin = "abcdefghijklmnopqrstuvwxyz0123456789"
  private val hebrew = "אבגדהוזחטיכלמנסעפצקרשתאבגדהוזחטיכלמנ"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_asof_join" -> ((s, d) => asofQuery(s, d)),
    "q75_salted_join" -> ((s, d) => saltedQuery(s, d, forced = false)),
    "q85_salted_forced" -> ((s, d) => saltedQuery(s, d, forced = true)),
    "q89_skew_salted" -> ((s, d) => skewSaltedQuery(s, d)),

    // The grammar pipeline's REAL text half with a full oracle: inject
    // deterministic diacritics (qamats on א, dagesh on ב) into the
    // transliterated corpus, then NFC, undiacritized projection,
    // nikud/dagesh counts, Hebrew-token filter, and the unicode QA
    // booleans — DuckDB derives all of it independently (nfc_normalize,
    // RE2 classes). Only the OCR/NER stubs remain outside the oracle.
    "q93_grammar_text" -> ((s, d) => {
      import graft.ops.GrammarPipeline
      import graft.functions.TextFunctions.charClassCount
      val heb = translate(lower(col("text")), latin, hebrew)
      val marked = regexp_replace(
        regexp_replace(heb, "א", "אָ"), "ב", "בּ")
      val nfc = GrammarPipeline.nfcNormalize(marked)
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          substring(GrammarPipeline.undiacritized(nfc), 1, 30)
            .as("undia_head"),
          charClassCount(nfc, "[\\u05B0-\\u05C7]").cast("int")
            .as("n_nikud"),
          charClassCount(nfc, "[\\u05BC]").cast("int").as("n_dagesh"),
          size(filter(split(nfc, "\\s+"),
            t => t.rlike("^[\\u0590-\\u05FF]+$"))).as("n_heb_tokens"),
          GrammarPipeline.validation(nfc)
            .getField("proper_normalization").as("proper_nfc"),
          GrammarPipeline.validation(nfc)
            .getField("hebrew_character_presence").as("has_hebrew"))
        .orderBy("doc_id")
    }),

    // HLL sketch counts for corpus stats (SURVEY §2.4 note). The sketch
    // value itself can't hash-match an independent engine (Spark's HLL++
    // and DuckDB's HLL differ by construction), so the query reduces it
    // to what IS deterministic: the exact counts, plus in-query booleans
    // asserting the sketch landed within 3x its configured rsd (0.05).
    // Oracle = exact counts + TRUE, TRUE; ApproxBoundSpec keeps the raw
    // quantitative error gate as defense-in-depth.
    "q76_approx_distinct" -> ((s, d) => {
      approxDistinctQuery(s, d)
    }),

    // P5: Hebrew-character count predicate over transliterated text.
    "q34_hebrew_count" -> ((s, d) => {
      val heb = translate(lower(col("text")), latin, hebrew)
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextFunctions.hebrewCharCount(heb).as("n_hebrew"),
          (TextFunctions.hebrewCharCount(heb) > 0).as("has_hebrew"))
        .orderBy("doc_id")
    }),

    // W7: running average (the ETA estimator's mean-so-far). Exact
    // decimal cumsum / count so both engines divide identical values
    // (double cumsums differ in the last ulp across engines).
    "q35_running_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // floor(x·10⁴+0.5)/10⁴ instead of round(): Spark rounds the
      // shortest decimal string of a double, DuckDB rounds the binary
      // value — they disagree within an ulp of a .xxxx5 boundary.
      val avgExact = sum(col("value").cast("decimal(18,2)")).over(w)
        .cast("double") / count(lit(1)).over(w)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          (floor(avgExact * 10000 + 0.5) / 10000).as("running_avg"))
        .orderBy("user_id", "event_id")
    }),

    // A10: per-group failed-id lists (sorted, stringified for a
    // deterministic cross-engine compare).
    "q36_failed_lists" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "error", 1)).as("n_failed"),
          concat_ws(",", sort_array(collect_list(
            when(col("event_type") === "error", col("event_id")))))
            .as("failed_ids"))
        .orderBy("user_id")
    }),

    // Cube grouping over two dimensions.
    "q37_cube" -> ((s, d) => {
      Tables.events(s, d)
        .cube(col("event_type"),
          (col("user_id") % 2 === 0).as("even_user"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first,
          col("even_user").asc_nulls_first)
    }),

    // BPE-ish token counting: word runs + isolated punctuation.
    "q38_bpe_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"),
            lit(0))).as("n_bpe_tokens"),
          TextFunctions.tokenCount(col("text")).as("n_ws_tokens"))
        .orderBy("doc_id")
    }),

    // Embedding-cosine near-dup pairs via multi-table sign-LSH banding
    // (4 tables × 8 sign bits): candidates collide in ANY table's
    // 256-bucket space — multi-table recall with buckets 16× finer than
    // the old single 4-bit table, whose within-bucket self-join went
    // quadratic over 1/16 of the corpus. Cosine verify keeps true
    // near-dups.
    "q39_cosine_dup_pairs" -> ((s, d) => {
      import graft.ops.Similarity
      val raw = Tables.embeddings(s, d)
      val pairs = Similarity.signBandPairs(raw, "vec_id", "embedding",
        bands = 4, bitsPerBand = 8)
      val vecs = raw.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      pairs
        .join(vecs.select(col("vec_id").as("id1"), col("v").as("v1")),
          "id1")
        .join(vecs.select(col("vec_id").as("id2"), col("v").as("v2")),
          "id2")
        .select(col("id1"), col("id2"),
          round(Similarity.cosine(col("v1"), col("v2")), 5).as("cos_sim"))
        .filter(col("cos_sim") > 0.85)
        .orderBy("id1", "id2")
    })
  )

  /** As-of join: each click attaches the latest prior-or-equal purchase
    * (per user). Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  private def asofQuery(s: SparkSession, d: String): DataFrame = {
    import graft.ops.AsOfJoin
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    AsOfJoin.nearestPrior(clicks, purchases, Seq("user_id"), "ts", "ts",
      Seq("purchase_id", "purchase_value"))
      .select(col("user_id"), col("event_id"),
        col("purchase_id"), col("purchase_value"))
      .orderBy("user_id", "event_id")
  }

  /** Salted join must be row-identical to the plain join — the oracle is
    * the UNsalted SQL for both variants. q75 is the production shape:
    * salting GATED on detected hot keys, which on this (non-skewed)
    * bench data degenerates to the plain AQE join — blanket salting
    * would pay 8× small-side shuffle amplification for nothing. q85
    * forces the salt on every key to keep the salting machinery itself
    * oracle-checked and to bench the contrast.
    */
  private def saltedQuery(s: SparkSession, d: String, forced: Boolean)
  : DataFrame = {
    import graft.ops.SkewJoin
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val joined =
      if (forced)
        SkewJoin.saltedJoin(l, o, Seq("l_orderkey"), "l_linenumber", k = 8)
      else
        SkewJoin.saltedJoinHot(l, o, Seq("l_orderkey"), "l_linenumber",
          k = 8, hotThreshold = 100000L)
    joined
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** GENUINE skew: ~2/3 of lineitem collapses onto one hot key (every
    * line number > 1), the rest spreads over 100 keys. saltedJoinHot
    * must detect key 1 from the sample and spread it over the salt
    * space; the oracle is the plain unsalted SQL — gating and salting
    * change the plan, never the rows.
    */
  private def skewSaltedQuery(s: SparkSession, d: String): DataFrame = {
    import graft.ops.SkewJoin
    val big = Tables.lineitem(s, d)
      .withColumn("skew_key",
        when(col("l_linenumber") > 1, lit(1L))
          .otherwise(pmod(col("l_orderkey"), lit(100)).cast("long")))
    val dim = s.range(0, 100)
      .select(col("id").as("skew_key"),
        concat(lit("g"), col("id") % 7).as("grp"))
    SkewJoin.saltedJoinHot(big, dim, Seq("skew_key"), "l_orderkey",
      k = 8, hotThreshold = 1000L, sampleFraction = 0.05)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .orderBy("grp")
  }

  /** HLL++ sketch vs exact distinct, reduced to oracle-checkable output.
    *
    * `withApprox = true` (ApproxBoundSpec) additionally exposes the raw
    * approx_* columns so the quantitative |approx-exact|/exact bound can
    * be asserted directly; the driver-facing q76 shape drops them so the
    * remaining columns are engine-independent. exact == 0 demands
    * approx == 0 (a ratio tolerance is vacuous at zero).
    */
  def approxDistinctQuery(s: SparkSession, d: String,
      withApprox: Boolean = false): DataFrame = {
    val agg = Tables.lineitem(s, d).agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      countDistinct(col("l_orderkey")).as("exact_orders"))
    def withinTol(a: String, e: String) =
      when(col(e) === 0, col(a) === 0)
        .otherwise(abs(col(a) - col(e)) / col(e) <= lit(0.15))
    val base = Seq(col("exact_parts"), col("exact_orders"),
      withinTol("approx_parts", "exact_parts").as("parts_within_tol"),
      withinTol("approx_orders", "exact_orders").as("orders_within_tol"))
    val cols = if (withApprox)
      base ++ Seq(col("approx_parts"), col("approx_orders"))
    else base
    agg.select(cols: _*)
  }

  def oracle: Map[String, String] = Map(
    "q76_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_within_tol, TRUE AS orders_within_tol
        |FROM lineitem""".stripMargin,

    "q93_grammar_text" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    nfc_normalize(replace(replace(
         |      translate(lower(text), '$latin', '$hebrew'),
         |      'א', 'אָ'), 'ב', 'בּ')) AS nfc
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id,
         |  substring(regexp_replace(nfc, '[\\x{05B0}-\\x{05C7}]', '', 'g'),
         |    1, 30) AS undia_head,
         |  CAST(length(nfc) - length(regexp_replace(nfc,
         |    '[\\x{05B0}-\\x{05C7}]', '', 'g')) AS INTEGER) AS n_nikud,
         |  CAST(length(nfc) - length(regexp_replace(nfc,
         |    '[\\x{05BC}]', '', 'g')) AS INTEGER) AS n_dagesh,
         |  CAST(len(list_filter(regexp_split_to_array(nfc, '\\s+'),
         |    t -> regexp_matches(t, '^[\\x{0590}-\\x{05FF}]+$$')))
         |    AS INTEGER) AS n_heb_tokens,
         |  nfc_normalize(nfc) = nfc AS proper_nfc,
         |  regexp_matches(nfc, '[\\x{0590}-\\x{05FF}]') AS has_hebrew
         |FROM m ORDER BY doc_id""".stripMargin,

    "q89_skew_salted" ->
      """SELECT grp, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM (SELECT CASE WHEN l_linenumber > 1 THEN 1
        |             ELSE l_orderkey % 100 END AS skew_key, l_quantity
        |      FROM lineitem) l
        |JOIN (SELECT i AS skew_key, 'g' || CAST(i % 7 AS VARCHAR) AS grp
        |      FROM range(0, 100) t(i)) d USING (skew_key)
        |GROUP BY grp ORDER BY grp""".stripMargin,

    "q74_asof_join" ->
      """SELECT c.user_id, c.event_id, p.event_id AS purchase_id,
        |  p.value AS purchase_value
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, event_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q75_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q85_salted_forced" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // DuckDB regexes are RE2: \x{hhhh} escapes, not Java's \uhhhh.
    "q34_hebrew_count" ->
      s"""SELECT doc_id,
         |  CAST(length(h) - length(regexp_replace(h, '[\\x{0590}-\\x{05FF}]', '', 'g')) AS INTEGER) AS n_hebrew,
         |  (length(h) - length(regexp_replace(h, '[\\x{0590}-\\x{05FF}]', '', 'g'))) > 0 AS has_hebrew
         |FROM (SELECT doc_id,
         |  translate(lower(text), '$latin', '$hebrew') AS h
         |  FROM documents) ORDER BY doc_id""".stripMargin,

    "q35_running_avg" ->
      """SELECT user_id, event_id,
        |  FLOOR(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) /
        |    COUNT(*) OVER w * 10000 + 0.5) / 10000 AS running_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q36_failed_lists" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_failed,
        |  array_to_string(list_sort(coalesce(list(event_id)
        |    FILTER (WHERE event_type = 'error'), [])), ',') AS failed_ids
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q37_cube" ->
      """SELECT event_type, (user_id % 2 = 0) AS even_user,
        |  COUNT(*) AS n
        |FROM events GROUP BY CUBE (event_type, (user_id % 2 = 0))
        |ORDER BY event_type ASC NULLS FIRST, even_user ASC NULLS FIRST""".stripMargin,

    "q38_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER)
        |    AS n_bpe_tokens,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS INTEGER) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q39_cosine_dup_pairs" -> {
      def bandBucket(band: Int): String =
        (0 until 8).map(i =>
          s"CASE WHEN embedding[${band * 8 + i + 1}] > 0 " +
            s"THEN ${1 << (7 - i)} ELSE 0 END").mkString(" + ")
      val bandsSql = (0 until 4).map(b =>
        s"SELECT vec_id, $b AS band, ${bandBucket(b)} AS bucket " +
          "FROM embeddings").mkString("\n  |  UNION ALL ")
      // cosine via list_dot_product on the pair row, NOT a per-dimension
      // unnest self-join: at the derived sf1 (20k vectors, ~2M distinct
      // candidates) DuckDB's planner turned the unnest join into an
      // i=i-first product that spilled >79 GB; the list form verified
      // the same 90k sf1 pairs in one second
      s"""WITH bands AS (
         |  $bandsSql),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bucket = y.bucket
         |      AND x.vec_id < y.vec_id),
         |vec AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |cos AS (
         |  SELECT c.id1, c.id2,
         |    list_dot_product(a.e, b.e)
         |      / (sqrt(list_dot_product(a.e, a.e))
         |         * sqrt(list_dot_product(b.e, b.e))) AS cs
         |  FROM cand c
         |  JOIN vec a ON a.vec_id = c.id1
         |  JOIN vec b ON b.vec_id = c.id2)
         |SELECT id1, id2, ROUND(cs, 5) AS cos_sim
         |FROM cos WHERE ROUND(cs, 5) > 0.85
         |ORDER BY id1, id2""".stripMargin
    }
  )
}
