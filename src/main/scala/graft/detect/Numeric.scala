package graft.detect

/** In-row numeric kernels for the detection pipeline. Pages are small
  * (n ≤ a few thousand nodes), so these run as plain Scala inside the fused
  * per-page map — Catalyst sees one deterministic function (SURVEY.md §1.2).
  * float64 throughout (SURVEY.md §7.5 risk 3).
  */
object Numeric {

  /** Deterministic SplitMix64 RNG — replaces the reference's unseeded
    * np.random.choice (plain_list.py:214,341; policy per SURVEY.md §7.5:
    * seeds derived from (urlHash, context)).
    */
  final class Rng(seed0: Long) {
    private var state = seed0
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** uniform in [0, bound) */
    def nextInt(bound: Int): Int = {
      require(bound > 0)
      ((nextLong() >>> 1) % bound).toInt
    }
    /** np.random.choice(arr, size) analog: `size` draws with replacement. */
    def choice(nItems: Int, size: Int): Array[Int] =
      Array.fill(size)(nextInt(nItems))
  }

  /** L1-normalize rows in place (zero rows untouched — sklearn normalize). */
  def l1NormalizeRows(m: Array[Array[Double]]): Unit = {
    var i = 0
    while (i < m.length) {
      val row = m(i)
      var s = 0.0
      var j = 0
      while (j < row.length) { s += math.abs(row(j)); j += 1 }
      if (s > 0) { j = 0; while (j < row.length) { row(j) /= s; j += 1 } }
      i += 1
    }
  }

  def l2NormalizeRows(m: Array[Array[Double]]): Unit = {
    var i = 0
    while (i < m.length) {
      val row = m(i)
      var s = 0.0
      var j = 0
      while (j < row.length) { s += row(j) * row(j); j += 1 }
      if (s > 0) { val inv = 1.0 / math.sqrt(s); j = 0; while (j < row.length) { row(j) *= inv; j += 1 } }
      i += 1
    }
  }

  /** PCA to k components: center columns, exact SVD (Breeze), project.
    * Replaces the reference's randomized-solver PCA (plain_list.py:191-195)
    * with a deterministic exact decomposition — distances (all DBSCAN uses)
    * are preserved up to component sign, which is irrelevant.
    */
  def pcaProject(x: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    import breeze.linalg.{DenseMatrix, svd}
    val nRows = x.length
    val nCols = x(0).length
    val mean = new Array[Double](nCols)
    var i = 0
    while (i < nRows) {
      var j = 0
      while (j < nCols) { mean(j) += x(i)(j); j += 1 }
      i += 1
    }
    var j = 0
    while (j < nCols) { mean(j) /= nRows; j += 1 }
    val m = DenseMatrix.tabulate(nRows, nCols)((r, c) => x(r)(c) - mean(c))
    val s = svd.reduced(m)
    val vt = s.Vt // (min(n,d), d)
    val kk = math.min(k, vt.rows)
    val out = Array.ofDim[Double](nRows, kk)
    i = 0
    while (i < nRows) {
      var c = 0
      while (c < kk) {
        var acc = 0.0
        var d = 0
        while (d < nCols) { acc += m(i, d) * vt(c, d); d += 1 }
        out(i)(c) = acc
        c += 1
      }
      i += 1
    }
    out
  }

  /** DBSCAN with euclidean metric — same algorithm semantics as sklearn
    * (plain_list.py:76-81): neighborhoods inclusive (dist <= eps), core iff
    * |N| >= minSamples (self included), clusters labeled in order of first
    * core point in index order, border points claimed by the first expanding
    * cluster. Returns labels (-1 = noise).
    *
    * Implementation: rows are deduplicated first and DBSCAN runs weighted
    * over the unique vectors (duplicate rows have identical neighborhoods,
    * core status, and labels — the repeated-list items that matter here ARE
    * exact duplicates, so this cuts the O(n^2 d) scan quadratically without
    * changing the result).
    */
  def dbscan(x: Array[Array[Double]], eps: Double, minSamples: Int): Array[Int] = {
    val n = x.length
    if (n == 0) return Array.empty
    // dedup rows preserving first-occurrence order
    final class Key(val row: Array[Double]) {
      override val hashCode: Int = java.util.Arrays.hashCode(row)
      override def equals(o: Any): Boolean = o match {
        case k: Key => java.util.Arrays.equals(row, k.row)
        case _ => false
      }
    }
    val uniqIndex = new java.util.HashMap[Key, Integer](n * 2)
    val rowToUniq = new Array[Int](n)
    val uniqRows = new scala.collection.mutable.ArrayBuffer[Array[Double]]
    val counts = new scala.collection.mutable.ArrayBuffer[Int]
    var i = 0
    while (i < n) {
      val k = new Key(x(i))
      val existing = uniqIndex.get(k)
      if (existing == null) {
        uniqIndex.put(k, uniqRows.length)
        rowToUniq(i) = uniqRows.length
        uniqRows += x(i)
        counts += 1
      } else {
        rowToUniq(i) = existing
        counts(existing) += 1
      }
      i += 1
    }
    val uniqLabels = dbscanWeighted(uniqRows.toArray, counts.toArray, eps, minSamples)
    Array.tabulate(n)(j => uniqLabels(rowToUniq(j)))
  }

  /** DBSCAN over unique vectors with multiplicities. */
  def dbscanWeighted(x: Array[Array[Double]], weight: Array[Int],
      eps: Double, minSamples: Int): Array[Int] = {
    val n = x.length
    val labels = Array.fill(n)(-1)
    if (n == 0) return labels
    val eps2 = eps * eps
    val neighbors: Array[Array[Int]] = {
      val out = new Array[Array[Int]](n)
      var i = 0
      while (i < n) {
        val buf = new scala.collection.mutable.ArrayBuffer[Int]
        var j = 0
        while (j < n) {
          var d2 = 0.0
          val xi = x(i); val xj = x(j)
          var k = 0
          val len = xi.length
          while (k < len && d2 <= eps2) { val d = xi(k) - xj(k); d2 += d * d; k += 1 }
          if (d2 <= eps2) buf += j
          j += 1
        }
        out(i) = buf.toArray
        i += 1
      }
      out
    }
    val core = Array.tabulate(n)(i => {
      var w = 0L
      neighbors(i).foreach(j => w += weight(j))
      w >= minSamples
    })
    var cluster = 0
    var i = 0
    val stack = new scala.collection.mutable.ArrayDeque[Int]
    while (i < n) {
      if (labels(i) == -1 && core(i)) {
        labels(i) = cluster
        stack.clear()
        neighbors(i).foreach(stack.append)
        while (stack.nonEmpty) {
          val q = stack.removeLast()
          if (labels(q) == -1) {
            labels(q) = cluster
            if (core(q)) neighbors(q).foreach(stack.append)
          }
        }
        cluster += 1
      }
      i += 1
    }
    labels
  }

  /** Shannon entropy (base e) of a count histogram — scipy.stats.entropy of
    * value_counts (plain_list.py:294-298; A-2 in SURVEY.md).
    */
  def entropyOfCounts(counts: Iterable[Long]): Double = {
    val total = counts.map(_.toDouble).sum
    if (total <= 0) return 0.0
    var e = 0.0
    counts.foreach { c =>
      if (c > 0) {
        val p = c / total
        e -= p * math.log(p)
      }
    }
    e
  }

  /** log_positive (webspot/detect/utils/math.py:8-9) = ln(1+x). */
  def logPositive(x: Double): Double = math.log1p(x)

  /** sigmoid (webspot/detect/utils/math.py:4-5, F4) = 1/(1+e^-x) — defined
    * and exported by the reference's math utils (unused by its detectors;
    * kept for API parity).
    */
  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
}
