package graft.functions

/** Fuzzy string-similarity kernels (reference X14: fuzz.ratio,
  * partial_ratio, token_sort_ratio, token_set_ratio —
  * hebrew_alignment_tool.py:351, fixed_hebrew_aligner.py:513-515,
  * scripts/hebrew_alignment_optimized.py:577-581).
  *
  * `ratio` is the normalized indel similarity 2·LCS/(|a|+|b|) — the same
  * quantity rapidfuzz's fuzz.ratio computes (Indel distance = |a|+|b|−2·LCS).
  * All kernels return percentages in [0, 100] like the reference, which
  * then divides by 100 against thresholds 0.7 / 0.6.
  *
  * Pure JVM functions: used directly inside the `flatMapGroups` alignment
  * kernels (no per-row UDF overhead there) and exposed as Spark UDFs via
  * [[FuzzyUdfs]] for Column-level use.
  */
object Fuzzy {

  /** Length of the longest common subsequence, two-row DP, O(|a|·|b|)
    * time and O(min) memory.
    */
  def lcsLength(a: CharSequence, b: CharSequence): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    if (n == 0) return 0
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var i = 0
    while (i < l.length) {
      val ci = l.charAt(i)
      var j = 0
      while (j < n) {
        cur(j + 1) =
          if (ci == s.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      i += 1
    }
    prev(n)
  }

  /** fuzz.ratio: 100 · 2·LCS/(|a|+|b|); 100 when both empty. */
  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) 100.0
    else 200.0 * lcsLength(a, b) / total
  }

  /** fuzz.partial_ratio: best `ratio` of the shorter string against any
    * same-length window of the longer one (sliding alignment).
    */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    if (s.length == l.length) return ratio(s, l)
    var best = 0.0
    var i = 0
    val last = l.length - s.length
    while (i <= last && best < 100.0) {
      val w = l.substring(i, i + s.length)
      val r = ratio(s, w)
      if (r > best) best = r
      i += 1
    }
    best
  }

  private def sortedTokens(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty).sorted

  /** fuzz.token_sort_ratio: ratio of the space-joined sorted tokens. */
  def tokenSortRatio(a: String, b: String): Double =
    ratio(sortedTokens(a).mkString(" "), sortedTokens(b).mkString(" "))

  /** fuzz.token_set_ratio: ratio over (intersection, intersection+restA,
    * intersection+restB) combinations, max of the three.
    */
  def tokenSetRatio(a: String, b: String): Double = {
    val ta = sortedTokens(a).toSet
    val tb = sortedTokens(b).toSet
    val inter = (ta & tb).toSeq.sorted.mkString(" ")
    val diffA = (ta -- tb).toSeq.sorted.mkString(" ")
    val diffB = (tb -- ta).toSeq.sorted.mkString(" ")
    val t1 = if (diffA.isEmpty) inter
      else if (inter.isEmpty) diffA else s"$inter $diffA"
    val t2 = if (diffB.isEmpty) inter
      else if (inter.isEmpty) diffB else s"$inter $diffB"
    math.max(ratio(inter, t1), math.max(ratio(inter, t2), ratio(t1, t2)))
  }

  /** max(ratio, partial_ratio) — the windowed aligner's similarity
    * (fixed_hebrew_aligner.py:513-515), as a 0–1 fraction.
    */
  def bestSimilarity(a: String, b: String): Double =
    math.max(ratio(a, b), partialRatio(a, b)) / 100.0
}

/** Hebrew text normalization (reference P3,
  * hebrew_alignment_tool.py:398-403): strip nikkud U+0591–U+05C7, keep
  * only Hebrew letters U+05D0–U+05EA and whitespace, squeeze whitespace.
  * Match-key only — never applied to output text (SURVEY.md §7.4 risk 6).
  */
object HebrewNorm {
  def normalize(text: String): String = {
    if (text == null || text.isEmpty) return ""
    val sb = new StringBuilder(text.length)
    var lastSpace = true
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 'א' && c <= 'ת') {
        sb.append(c); lastSpace = false
      } else if (c >= '֑' && c <= 'ׇ') {
        // nikkud / cantillation: dropped entirely
      } else if (Character.isWhitespace(c)) {
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      }
      // any other char: dropped (matches [^א-ת\s] removal)
      i += 1
    }
    sb.toString.strip
  }
}
