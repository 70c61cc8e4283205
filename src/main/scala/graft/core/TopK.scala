package graft.core

/** Bounded top-k min-heap over (score, docId) pairs packed into one Long,
  * mirroring the reference's packed-long `NodeQueue`
  * (jvector `graph/NodeQueue.java:42-62,114-117` and
  * `util/BoundedLongHeap.java`): float score in the high 32 bits via the
  * sortable-int trick, docId's low bits below, and the identical
  * deterministic tie-break — equal scores prefer the SMALLER docId.
  *
  * Packing: [sortableScoreBits:32][~docId:31]. Inverting the docId bits
  * makes a *larger* packed long mean (higher score, OR same score and
  * smaller docId), so a min-heap on packed longs keeps exactly the k best
  * under the (score desc, docId asc) order we must reproduce for
  * rank-identity with the SQL oracle.
  *
  * docId must fit in 31 bits here; the engine keeps full 64-bit docIds and
  * only uses this heap per doc-shard where local ordinals are dense ints.
  */
final class TopK(k: Int) {
  require(k > 0)
  private val heap = new Array[Long](k) // min-heap, heap(0) = worst kept
  private var n = 0

  @inline private def pack(score: Float, localDoc: Int): Long = {
    // NaN-free sortable int for non-negative BM25 scores; handle negatives
    // generally anyway (sortable-int trick works for all floats).
    val bits = java.lang.Float.floatToIntBits(score)
    val sortable = if (bits < 0) ~bits else bits | Int.MinValue
    ((sortable.toLong & 0xFFFFFFFFL) << 31) | ((~localDoc).toLong & 0x7FFFFFFFL)
  }
  @inline def unpackScore(p: Long): Float = {
    val s = (p >>> 31).toInt
    val bits = if (s < 0) s & Int.MaxValue else ~s
    java.lang.Float.intBitsToFloat(bits)
  }
  @inline def unpackDoc(p: Long): Int = (~p).toInt & 0x7FFFFFFF

  def size: Int = n
  def isFull: Boolean = n == k

  /** Current kth-best score, or -Inf while under-full (the WAND θ). */
  def threshold: Float =
    if (n < k) Float.NegativeInfinity else unpackScore(heap(0))

  /** Would (score, doc) enter the heap? (strictly better than current worst
    * under the packed order — ties on score resolve by smaller docId). */
  def wouldAccept(score: Float, localDoc: Int): Boolean =
    n < k || pack(score, localDoc) > heap(0)

  def offer(score: Float, localDoc: Int): Boolean = {
    val p = pack(score, localDoc)
    if (n < k) { heap(n) = p; siftUp(n); n += 1; true }
    else if (p > heap(0)) { heap(0) = p; siftDown(0); true }
    else false
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val parent = (i - 1) >>> 1
      if (heap(i) < heap(parent)) {
        val t = heap(i); heap(i) = heap(parent); heap(parent) = t; i = parent
      } else return
    }
  }
  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && heap(l) < heap(m)) m = l
      if (r < n && heap(r) < heap(m)) m = r
      if (m == i) return
      val t = heap(i); heap(i) = heap(m); heap(m) = t; i = m
    }
  }

  /** Drain best-first: (score desc, docId asc). Heap is emptied. */
  def drain(): Array[(Float, Int)] = {
    val out = new Array[(Float, Int)](n)
    var i = n - 1
    while (i >= 0) {
      val p = heap(0)
      out(i) = (unpackScore(p), unpackDoc(p))
      n -= 1
      heap(0) = heap(n)
      siftDown(0)
      i -= 1
    }
    out
  }
}
