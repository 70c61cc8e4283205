package graft.core

/** Bounded top-k over (score: Double, docId: Long) under the order
  * (score desc, docId asc) — the double-precision sibling of [[TopK]]
  * used by the WAND scorer, where scores are exact BM25 doubles (the
  * rank-identity contract vs the SQL oracle forbids float truncation).
  * Same deterministic tie-break as jvector's NodeQueue: smaller id wins
  * (graph/NodeQueue.java:114-117).
  */
final class DoubleTopK(k: Int) {
  require(k > 0)
  private val score = new Array[Double](k)
  private val doc = new Array[Long](k)
  private var n = 0

  /** true if (s1,d1) is WORSE than (s2,d2) under (score desc, docId asc). */
  @inline private def worse(s1: Double, d1: Long, s2: Double, d2: Long): Boolean =
    s1 < s2 || (s1 == s2 && d1 > d2)

  def size: Int = n
  def isFull: Boolean = n == k

  /** kth-best score, or -Inf while under-full (the WAND θ). A candidate
    * prunes only if its upper bound cannot BEAT the worst kept entry. */
  def threshold: Double = if (n < k) Double.NegativeInfinity else score(0)

  def wouldAccept(s: Double, d: Long): Boolean =
    n < k || worse(score(0), doc(0), s, d)

  def offer(s: Double, d: Long): Boolean = {
    if (n < k) { score(n) = s; doc(n) = d; siftUp(n); n += 1; true }
    else if (worse(score(0), doc(0), s, d)) {
      score(0) = s; doc(0) = d; siftDown(0); true
    } else false
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = score(i); score(i) = score(j); score(j) = ts
    val td = doc(i); doc(i) = doc(j); doc(j) = td
  }
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >>> 1
      if (worse(score(i), doc(i), score(p), doc(p))) { swap(i, p); i = p }
      else return
    }
  }
  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(score(l), doc(l), score(m), doc(m))) m = l
      if (r < n && worse(score(r), doc(r), score(m), doc(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  /** Drain best-first: (score desc, docId asc). Heap is emptied. */
  def drain(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = n - 1
    while (i >= 0) {
      out(i) = (score(0), doc(0))
      n -= 1
      score(0) = score(n); doc(0) = doc(n)
      siftDown(0)
      i -= 1
    }
    out
  }
}
