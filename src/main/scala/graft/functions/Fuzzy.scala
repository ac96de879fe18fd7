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

  /** Length of the longest common subsequence. Bit-parallel
    * (Allison–Dix): one machine word processes 64 characters of the
    * shorter string per step — ~64× the classic DP on typical word/verse
    * lengths, which makes this the aligner's hot loop affordable at
    * corpus scale. Multi-block with borrow/carry chains for shorter
    * strings beyond 64 chars.
    */
  def lcsLength(a: CharSequence, b: CharSequence): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    if (n == 0) return 0
    // tiny problems: the DP beats mask-building overhead (word-vs-word,
    // the greedy aligner's common case); larger: bit-parallel wins ~2.6×
    // at verse length and grows with |s|.
    if (n.toLong * l.length <= 512) lcsLengthDp(s, l)
    else if (n <= 64) lcsBitParallel1(s, l)
    else lcsBitParallelK(s, l)
  }

  /** Single-word bit-parallel LCS: R = x & ~(x − ((R<<1)|1)), x = M|R. */
  private def lcsBitParallel1(s: CharSequence, l: CharSequence): Int = {
    val n = s.length
    val masks = new java.util.HashMap[Character, java.lang.Long](n * 2)
    var j = 0
    while (j < n) {
      val c = s.charAt(j)
      val prev = masks.get(c)
      masks.put(c, (if (prev == null) 0L else prev.longValue) | (1L << j))
      j += 1
    }
    var r = 0L
    var i = 0
    while (i < l.length) {
      val m = masks.get(l.charAt(i))
      if (m != null) {
        val x = m.longValue | r
        r = x & ~(x - ((r << 1) | 1L))
        // mask out bits beyond n (j < 64 shifts never overflow here)
        if (n < 64) r &= (1L << n) - 1
      }
      i += 1
    }
    java.lang.Long.bitCount(r)
  }

  /** Multi-word variant: 64-char blocks with carry (shift) and borrow
    * (subtract) propagation.
    */
  private def lcsBitParallelK(s: CharSequence, l: CharSequence): Int = {
    val n = s.length
    val k = (n + 63) >>> 6
    val masks = new java.util.HashMap[Character, Array[Long]](n * 2)
    var j = 0
    while (j < n) {
      val c = s.charAt(j)
      var m = masks.get(c)
      if (m == null) { m = new Array[Long](k); masks.put(c, m) }
      m(j >>> 6) |= 1L << (j & 63)
      j += 1
    }
    val r = new Array[Long](k)
    val x = new Array[Long](k)
    val sub = new Array[Long](k)
    val topMask = if ((n & 63) == 0) -1L else (1L << (n & 63)) - 1
    var i = 0
    while (i < l.length) {
      val m = masks.get(l.charAt(i))
      if (m != null) {
        // x = M | R ; y = (R << 1) | 1 with inter-block carry
        var carry = 1L
        var borrow = 0L
        var blk = 0
        while (blk < k) {
          x(blk) = m(blk) | r(blk)
          val shifted = (r(blk) << 1) | carry
          carry = r(blk) >>> 63
          // sub = x - shifted - borrow (borrow-propagating)
          val d1 = x(blk) - shifted
          val b1 = if (java.lang.Long.compareUnsigned(x(blk), shifted) < 0) 1L
            else 0L
          val d2 = d1 - borrow
          val b2 = if (borrow == 1L &&
            java.lang.Long.compareUnsigned(d1, borrow) < 0) 1L else 0L
          sub(blk) = d2
          borrow = b1 | b2
          blk += 1
        }
        blk = 0
        while (blk < k) {
          r(blk) = x(blk) & ~sub(blk)
          blk += 1
        }
        r(k - 1) &= topMask
      }
      i += 1
    }
    var total = 0
    var blk = 0
    while (blk < k) { total += java.lang.Long.bitCount(r(blk)); blk += 1 }
    total
  }

  /** Reference two-row DP — retained as the property-test oracle for the
    * bit-parallel implementations.
    */
  private[graft] def lcsLengthDp(a: CharSequence, b: CharSequence): Int = {
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
    * alignment window of the longer one — the |s|-length interior
    * windows AND the truncated boundary windows (prefixes/suffixes of
    * the longer string shorter than |s|), matching rapidfuzz's sliding
    * alignment exactly: rapidfuzz scores s sliding from −(|s|−1) to
    * |l|−1 with the window clipped to l's bounds, so e.g.
    * partial_ratio("abcd", "xxxab") = ratio("abcd", "ab") ≈ 66.7, not
    * the 50 the best interior window gives. The reference's 0.6/0.7
    * thresholds were tuned against these semantics. Boundary windows
    * apply at EVERY length combination — equal-length inputs also slide
    * past both ends (partial_ratio("ab","ba") ≈ 66.7, not 50), so there
    * is no discontinuity between |l| = |s| and |l| = |s|+1.
    *
    * Shorter string ≤ 64 chars (the common case — words and verses):
    * match masks build ONCE and every interior window runs the
    * single-word bit-parallel recurrence with zero allocation; the
    * per-window cost is |s| word ops, so the whole scan is
    * O((|l|−|s|)·|s|/64) words. Boundary windows cost O(|s|²/64) total.
    */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    val interior =
      if (s.length <= 64) partialRatioBitParallel(s, l)
      else {
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
    if (interior >= 100.0) return 100.0
    // truncated boundary alignments: s sliding off either end of l
    var best = interior
    var k = 1
    while (k < s.length) {
      val pre = ratio(s, l.substring(0, k)) // s overlapping l's start
      if (pre > best) best = pre
      val suf = ratio(s, l.substring(l.length - k)) // ... l's end
      if (suf > best) best = suf
      k += 1
    }
    best
  }

  private def partialRatioBitParallel(s: String, l: String): Double = {
    val n = s.length
    val masks = new java.util.HashMap[Character, java.lang.Long](n * 2)
    var j = 0
    while (j < n) {
      val c = s.charAt(j)
      val prev = masks.get(c)
      masks.put(c, (if (prev == null) 0L else prev.longValue) | (1L << j))
      j += 1
    }
    val topMask = if (n == 64) -1L else (1L << n) - 1
    var best = 0
    var i = 0
    val last = l.length - n
    while (i <= last && best < n) {
      var r = 0L
      var k = i
      val end = i + n
      while (k < end) {
        val m = masks.get(l.charAt(k))
        if (m != null) {
          val x = m.longValue | r
          r = (x & ~(x - ((r << 1) | 1L))) & topMask
        }
        k += 1
      }
      val lcs = java.lang.Long.bitCount(r)
      if (lcs > best) best = lcs
      i += 1
    }
    100.0 * (2 * best) / (2 * n) // ratio of two n-length windows
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
