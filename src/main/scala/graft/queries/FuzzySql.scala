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

  /** LCS of `a` and `b`; `a` is the mask side and must stay ≤ 63 chars
    * (fixture tokens ≤ 8, part names ≤ 12 — far inside the bound).
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
}
