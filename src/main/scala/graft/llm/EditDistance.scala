package graft.llm

/** Exact Levenshtein distance, optimized for near-identical inputs —
  * the only inputs x29 ever feeds it (simhash candidates at hamming
  * ≤ 3 are near-duplicate texts).
  *
  * The built-in `levenshtein` expression always fills the full
  * O(|a|·|b|) DP table; for two 3 000-char near-identical documents
  * that is ~9M cells to confirm a distance of a handful. This kernel
  * computes the SAME value (guide §1.2 step 2 — per-task work after
  * the plan shape is right) via two classical exact-preserving tricks:
  *
  *  1. common prefix/suffix stripping (removing a shared prefix or
  *     suffix never changes the distance), which collapses near-dup
  *     pairs to their small differing middle;
  *  2. Ukkonen's banded DP with band doubling: a DP restricted to
  *     |i−j| ≤ band is exact whenever its result ≤ band, so start at
  *     the length delta and double until the result fits — O(d·len)
  *     for true distance d instead of O(len²).
  *
  * Operates on Unicode code points, matching the built-in expression's
  * semantics; EditDistanceSpec property-pins agreement with the
  * built-in (which is what the DuckDB oracle hash checks against).
  */
object EditDistance {

  def exact(sa: String, sb: String): Int = {
    if (sa == sb) return 0
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    // strip common prefix, then common suffix (distance-invariant)
    var lo = 0
    val maxLo = math.min(a.length, b.length)
    while (lo < maxLo && a(lo) == b(lo)) lo += 1
    var ahi = a.length
    var bhi = b.length
    while (ahi > lo && bhi > lo && a(ahi - 1) == b(bhi - 1)) {
      ahi -= 1; bhi -= 1
    }
    val n = ahi - lo
    val m = bhi - lo
    // s = shorter remainder, t = longer (sn <= tn)
    val (s, t, sn, tn) = if (n <= m) (a, b, n, m) else (b, a, m, n)
    if (sn == 0) return tn
    var band = math.max(tn - sn, 1)
    while (band < tn) {
      val d = banded(s, lo, sn, t, lo, tn, band)
      if (d <= band) return d
      band <<= 1
    }
    banded(s, lo, sn, t, lo, tn, tn) // full-width DP: always exact
  }

  /** DP over rows i∈[0,sn] (shorter side), cols j∈[0,tn], restricted to
    * |i−j| ≤ band with INF sentinels outside. Exact when the returned
    * value ≤ band (Ukkonen: any alignment with ≤ band edits never
    * leaves the band); otherwise merely a witness that distance > band. */
  private def banded(s: Array[Int], so: Int, sn: Int,
      t: Array[Int], to: Int, tn: Int, band: Int): Int = {
    val INF = Int.MaxValue / 2
    var prev = new Array[Int](tn + 1)
    var cur = new Array[Int](tn + 1)
    java.util.Arrays.fill(prev, INF)
    var j = 0
    val j0 = math.min(tn, band)
    while (j <= j0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= sn) {
      val jLo = math.max(1, i - band)
      val jHi = math.min(tn, i + band)
      java.util.Arrays.fill(cur, INF)
      if (i - band <= 0) cur(0) = i
      val sc = s(so + i - 1)
      j = jLo
      while (j <= jHi) {
        var v = prev(j - 1) + (if (sc == t(to + j - 1)) 0 else 1)
        if (prev(j) + 1 < v) v = prev(j) + 1 // delete (INF-safe: INF+1 < INF*2)
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1 // insert
        cur(j) = v
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(tn)
  }
}
