package graft.core

/** CPython difflib parity: SequenceMatcher.ratio() and
  * get_close_matches(word, keys, n=1, cutoff) — the reference's fuzzy
  * config-key lookup (scripts/app_debug/debug_utils.py:66-70 calls
  * `get_close_matches(subject, keys, n=1, cutoff=0.6)`).
  *
  * Reimplements the published SequenceMatcher algorithm (Ratcliff-
  * Obershelp style recursive longest-matching-block) including CPython's
  * exact details a parity corpus exercises:
  *  - b2j index over seq2 with the autojunk rule (elements occurring in
  *    more than 1% of seq2 become junk when len(seq2) >= 200);
  *  - find_longest_match's DP over b2j with the lowest-(i,j) tie-break
  *    and the junk-extension passes;
  *  - ratio = 2·M / (len(a)+len(b));
  *  - get_close_matches tie-break: equal ratios resolve to the
  *    lexicographically LARGER key (heapq.nlargest on (ratio, key)).
  * Verified char-for-char against CPython outputs in DifflibSpec
  * (370 ratio cases incl. autojunk regime + 27 close-match cases).
  */
object Difflib {

  /** SequenceMatcher(None, a, b).ratio(). */
  def ratio(a: String, b: String): Double = {
    val t = a.length + b.length
    if (t == 0) return 1.0
    2.0 * matchTotal(a, b) / t
  }

  /** get_close_matches(word, keys, n=1, cutoff)(0) — None → null. */
  def closestMatch(word: String, keys: Seq[String], cutoff: Double = 0.6): Option[String] = {
    var bestR = -1.0
    var best: String = null
    for (k <- keys) {
      val r = ratio(k, word)
      if (r >= cutoff && (r > bestR || (r == bestR && (best == null || k.compareTo(best) > 0)))) {
        bestR = r; best = k
      }
    }
    Option(best)
  }

  /** Total matched chars M over all matching blocks. */
  private def matchTotal(a: String, b: String): Int = {
    // ---- b2j with autojunk (CPython __chain_b) ----
    val b2j = new java.util.HashMap[Character, java.util.ArrayList[Integer]]()
    var j = 0
    while (j < b.length) {
      var l = b2j.get(b.charAt(j))
      if (l == null) { l = new java.util.ArrayList[Integer](4); b2j.put(b.charAt(j), l) }
      l.add(j)
      j += 1
    }
    if (b.length >= 200) {
      val ntest = b.length / 100 + 1
      val it = b2j.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getValue.size() > ntest) it.remove()
      }
    }

    def findLongest(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = new java.util.HashMap[Integer, Integer]()
      var i = alo
      while (i < ahi) {
        val newj2len = new java.util.HashMap[Integer, Integer]()
        val js = b2j.get(a.charAt(i))
        if (js != null) {
          var x = 0
          var break = false
          while (x < js.size() && !break) {
            val jj = js.get(x).intValue()
            if (jj >= blo) {
              if (jj >= bhi) break = true
              else {
                val prev = j2len.get(Integer.valueOf(jj - 1))
                val k = (if (prev == null) 0 else prev.intValue()) + 1
                newj2len.put(jj, k)
                if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
              }
            }
            x += 1
          }
        }
        j2len = newj2len
        i += 1
      }
      // CPython's extension passes. With isjunk=None the bjunk set is
      // EMPTY — autojunk-popular elements land in bpopular and are
      // excluded only from the b2j DP index above, not treated as junk.
      // So the non-junk passes extend across ANY equal chars (including
      // popular ones) and the junk passes are vacuous and omitted.
      while (besti > alo && bestj > blo &&
          a.charAt(besti - 1) == b.charAt(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
          a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) {
        bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    // recursive block sum (explicit stack; only the total is needed)
    var total = 0
    val stack = new java.util.ArrayDeque[(Int, Int, Int, Int)]()
    stack.push((0, a.length, 0, b.length))
    while (!stack.isEmpty) {
      val (alo, ahi, blo, bhi) = stack.pop()
      val (i2, j2, k) = findLongest(alo, ahi, blo, bhi)
      if (k > 0) {
        total += k
        if (alo < i2 && blo < j2) stack.push((alo, i2, blo, j2))
        if (i2 + k < ahi && j2 + k < bhi) stack.push((i2 + k, ahi, j2 + k, bhi))
      }
    }
    total
  }
}
