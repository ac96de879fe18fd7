package graft.queries

/** DuckDB SQL renderings of the [[graft.functions.Fuzzy]] kernels, used
  * by the aligner (q60/q61) and native-fuzzy (q68) oracles. DuckDB has
  * no LCS/indel builtin, but the Allison–Dix bit-parallel LCS recurrence
  * (R' = x & ~(x − ((R<<1)|1)), x = mask|R — the same one the JVM
  * kernels run, Fuzzy.scala:39-62) is pure integer arithmetic, so a
  * `list_reduce` over one BIGINT mask per character expresses it
  * exactly. Every helper mirrors its JVM counterpart op-for-op (same
  * division order, same special cases) so doubles match bit-exactly.
  *
  * All emitted SQL avoids stripMargin: the folds contain literal `|`
  * bitwise operators that a margin strip would eat if a wrap ever put
  * one at line head.
  */
private[queries] object FuzzySql {

  /** LCS of `a` and `b`; `a` is the mask side and must stay ≤ 62 chars:
    * the confinement mask `(1::BIGINT << length(a)) - 1` overflows
    * BIGINT at exactly 63 (DuckDB raises out-of-range), so 62 is the
    * real bound — route longer strings through the HUGEINT variants in
    * AlignQueries. Fixture tokens ≤ 8, part names ≤ 12, token_set's
    * sorted-token concatenations ≤ ~58 — all inside the bound.
    */
  def lcsExpr(a: String, b: String): String =
    s"""bit_count(list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(range(length($b)), p ->
         CAST(coalesce(list_sum(list_transform(range(length($a)), j ->
           CASE WHEN $a[CAST(j + 1 AS INTEGER)] = $b[CAST(p + 1 AS INTEGER)]
                THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)), 0)
           AS BIGINT))),
       (r, mk) -> ((mk | r) & ~((mk | r) - ((r << 1) | CAST(1 AS BIGINT))))
                  & ((CAST(1 AS BIGINT) << length($a)) - 1)))"""

  /** fuzz.ratio as 0–100 DOUBLE: 200·LCS/(|a|+|b|), 100 when both empty
    * ([[graft.functions.Fuzzy.ratio]]).
    */
  def ratioExpr(a: String, b: String): String =
    s"""(CASE WHEN length($a) + length($b) = 0 THEN CAST(100.0 AS DOUBLE)
          WHEN length($a) = 0 OR length($b) = 0 THEN CAST(0.0 AS DOUBLE)
          ELSE 200.0 * ${lcsExpr(a, b)} / (length($a) + length($b)) END)"""

  /** fuzz.partial_ratio as 0–100 DOUBLE over pre-bound v.s (shorter) /
    * v.l (longer): interior n-length windows in the 100·(2·best)/(2·n)
    * form plus the truncated boundary windows, mirroring
    * [[graft.functions.Fuzzy.partialRatio]] exactly. Use inside a
    * [[bindShorterLonger]] lambda.
    */
  def partialBodyExpr: String = {
    val win = "v.l[CAST(i + 1 AS INTEGER):CAST(i + length(v.s) AS INTEGER)]"
    val pre = "v.l[1:CAST(kk AS INTEGER)]"
    val suf = "v.l[CAST(length(v.l) - kk + 1 AS INTEGER):" +
      "CAST(length(v.l) AS INTEGER)]"
    val interior = "100.0 * (2 * list_max(list_transform(" +
      "range(length(v.l) - length(v.s) + 1), i -> " +
      lcsExpr("v.s", win) + "))) / (2 * length(v.s))"
    val boundary =
      s"""coalesce(list_max(list_transform(range(1, length(v.s)),
         kk -> greatest(
           200.0 * ${lcsExpr("v.s", pre)} / (length(v.s) + kk),
           200.0 * ${lcsExpr("v.s", suf)} / (length(v.s) + kk)))),
         CAST(0.0 AS DOUBLE))"""
    s"""(CASE WHEN length(v.s) = 0 THEN
          (CASE WHEN length(v.l) = 0 THEN CAST(100.0 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END)
        ELSE greatest($interior, $boundary) END)"""
  }

  /** SQL's only let-binding: a 1-element-list lambda that binds the
    * shorter of `a`/`b` as v.s and the longer as v.l, then evaluates
    * `body`.
    */
  def bindShorterLonger(a: String, b: String, body: String): String =
    s"""list_transform([struct_pack(
         s := CASE WHEN length($a) <= length($b) THEN $a ELSE $b END,
         l := CASE WHEN length($a) <= length($b) THEN $b ELSE $a END)],
       v -> $body)[1]"""

  /** fuzz.partial_ratio(a, b) as a standalone 0–100 expression. */
  def partialExpr(a: String, b: String): String =
    bindShorterLonger(a, b, partialBodyExpr)

  /** max(ratio, partial_ratio)/100 —
    * [[graft.functions.Fuzzy.bestSimilarity]].
    */
  def simExpr(a: String, b: String): String =
    bindShorterLonger(a, b,
      s"greatest(${ratioExpr(a, b)}, $partialBodyExpr) / 100.0")

  // ---- HUGEINT variants: general strings up to 126 chars on the mask
  // side (the verse_fuzzy kernel scores whole verses against the full
  // chapter transcription — past the 62-char BIGINT bound, inside
  // HUGEINT's 127 value bits). Character access goes through
  // string_split arrays (O(1) list indexing; DuckDB string indexing
  // rescans UTF-8 per access), and partial_ratio binds the mask list
  // ONCE per pair so the ~630 interior windows fold over slices instead
  // of rebuilding masks per window.

  /** Allison–Dix LCS fold over a pre-built HUGEINT mask list. */
  def hugeFold(mlist: String, n: String): String =
    s"""bit_count(list_reduce(list_prepend(CAST(0 AS HUGEINT),
       $mlist),
       (r, mk) -> ((mk | r) & ~((mk | r) - ((r << 1) | CAST(1 AS HUGEINT))))
                  & ((CAST(1 AS HUGEINT) << ($n)) - 1)))"""

  /** One HUGEINT mask per char of `lc` against positions of `sc`. */
  def hugeMasks(lc: String, sc: String, n: String): String =
    s"""list_transform($lc, ch ->
       CAST(coalesce(list_sum(list_transform(range($n), j ->
         CASE WHEN $sc[CAST(j + 1 AS INTEGER)] = ch
              THEN (CAST(1 AS HUGEINT) << j)
              ELSE CAST(0 AS HUGEINT) END)), 0) AS HUGEINT))"""

  /** fuzz.ratio for general strings (shorter side ≤ 126 chars). */
  def ratioHuge(x: String, y: String): String = {
    val body = hugeFold(hugeMasks("string_split(v.l, '')",
      "string_split(v.s, '')", "length(v.s)"), "length(v.s)")
    s"""list_transform([struct_pack(
       s := CASE WHEN length($x) <= length($y) THEN $x ELSE $y END,
       l := CASE WHEN length($x) <= length($y) THEN $y ELSE $x END)],
     v -> CASE WHEN length(v.s) + length(v.l) = 0 THEN CAST(100.0 AS DOUBLE)
               WHEN length(v.s) = 0 THEN CAST(0.0 AS DOUBLE)
               ELSE 200.0 * $body / (length(v.s) + length(v.l)) END)[1]"""
  }

  /** fuzz.partial_ratio for general strings, mask list bound once. */
  def partialHuge(a: String, b: String): String = {
    val interior = "100.0 * (2 * list_max(list_transform(" +
      "range(len(ml) - q.n + 1), i -> " +
      hugeFold("ml[CAST(i + 1 AS BIGINT):CAST(i + q.n AS BIGINT)]",
        "q.n") + "))) / (2 * q.n)"
    val boundary =
      s"""coalesce(list_max(list_transform(range(1, q.n), kk ->
         greatest(
           200.0 * ${hugeFold("ml[1:CAST(kk AS BIGINT)]", "q.n")}
             / (q.n + kk),
           200.0 * ${hugeFold(
        "ml[CAST(len(ml) - kk + 1 AS BIGINT):CAST(len(ml) AS BIGINT)]",
        "q.n")} / (q.n + kk)))),
         CAST(0.0 AS DOUBLE))"""
    s"""list_transform([struct_pack(
       s := CASE WHEN length($a) <= length($b) THEN $a ELSE $b END,
       l := CASE WHEN length($a) <= length($b) THEN $b ELSE $a END)],
     v -> CASE WHEN length(v.s) = 0 THEN
            (CASE WHEN length(v.l) = 0 THEN CAST(100.0 AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END)
          ELSE list_transform([struct_pack(
              n := length(v.s),
              sc := string_split(v.s, ''),
              lc := string_split(v.l, ''))], q ->
            list_transform([${hugeMasks("q.lc", "q.sc", "q.n")}], ml ->
              greatest($interior, $boundary))[1])[1]
          END)[1]"""
  }

  /** Sorted tokens as in Fuzzy.sortedTokens: split on \s+, drop
    * empties, sort (DuckDB's binary collation and Java's UTF-16 order
    * agree on BMP text).
    */
  def sortedToks(x: String): String =
    s"list_sort(list_filter(string_split_regex($x, '\\s+'), t -> t <> ''))"

  /** fuzz.token_sort_ratio via [[ratioHuge]]. */
  def tokenSortHuge(a: String, b: String): String =
    ratioHuge(
      s"coalesce(array_to_string(${sortedToks(a)}, ' '), '')",
      s"coalesce(array_to_string(${sortedToks(b)}, ' '), '')")

  /** fuzz.token_set_ratio via [[ratioHuge]]: distinct-token
    * intersection/differences assembled exactly like
    * [[graft.functions.Fuzzy.tokenSetRatio]] (empty-part handling
    * included; array_to_string of an empty list is NULL, hence the
    * coalesces).
    */
  def tokenSetHuge(a: String, b: String): String =
    s"""list_transform([struct_pack(
       ta := list_distinct(${sortedToks(a)}),
       tb := list_distinct(${sortedToks(b)}))], w0 ->
     list_transform([struct_pack(
         inter := coalesce(array_to_string(list_sort(list_filter(w0.ta,
           x -> list_contains(w0.tb, x))), ' '), ''),
         da := coalesce(array_to_string(list_sort(list_filter(w0.ta,
           x -> NOT list_contains(w0.tb, x))), ' '), ''),
         db := coalesce(array_to_string(list_sort(list_filter(w0.tb,
           x -> NOT list_contains(w0.ta, x))), ' '), ''))], w1 ->
       list_transform([struct_pack(
           t1 := CASE WHEN w1.da = '' THEN w1.inter
                      WHEN w1.inter = '' THEN w1.da
                      ELSE w1.inter || ' ' || w1.da END,
           t2 := CASE WHEN w1.db = '' THEN w1.inter
                      WHEN w1.inter = '' THEN w1.db
                      ELSE w1.inter || ' ' || w1.db END)], w2 ->
         greatest(${ratioHuge("w1.inter", "w2.t1")},
           greatest(${ratioHuge("w1.inter", "w2.t2")},
                    ${ratioHuge("w2.t1", "w2.t2")})))[1])[1])[1]"""
}
