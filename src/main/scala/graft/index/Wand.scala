package graft.index

import graft.core.{Codec, DoubleTopK, Text}

/** Executor-local Block-Max WAND scorer over one doc-shard's posting
  * blocks — the engine's re-expression of jvector's greedy best-first
  * top-k search with early termination (graph/GraphSearcher.java:245-306:
  * bounded result heap, stop when best-possible < current-kth). Here the
  * same "upper bound vs θ" logic drives exact block skipping: a block is
  * decoded only if the idf·tf-part bound of the blocks covering the pivot can
  * still beat the heap threshold, so payload bytes for skipped blocks are
  * never read (the locality idea of jvector's FusedADC layout,
  * graph/disk/FusedADC.java:87-106, as metadata/payload column split).
  *
  * All scores are exact doubles; pruning uses true upper bounds, so the
  * result is rank-identical to brute force (no approximate stop needed —
  * unlike the reference's probabilistic ScoreTracker.java:80-96).
  */
object Wand {

  /** Debug tracing (-Dwand.trace at JVM start). Read ONCE at class load
    * into a static final — a per-iteration sys.props lookup inside the
    * skip loop would defeat JIT hoisting on the hot path. */
  private final val Trace = sys.props.contains("wand.trace")

  /** Per-term cursor over score-sorted blocks (firstDocId ascending).
    * Block payloads decode lazily: `shallowTo` moves over block metadata
    * only; decode happens on first deep access. */
  final class TermCursor(val idf: Double, val ub: Double,
                         blocks: Array[Block], avgdl: Double) {
    private var bi = 0
    private var pi = 0
    private var decodedBi = -1
    private var ids: Array[Long] = null
    private var tfs: Array[Int] = null
    private var dls: Array[Int] = null
    var decodedBlocks = 0L // metric: blocks actually decoded (vs skipped)

    @inline private def exhausted: Boolean = bi >= blocks.length

    private def decode(): Unit = if (decodedBi != bi) {
      val b = blocks(bi)
      ids = Codec.decodeDocIds(b.docBytes, -1L)
      tfs = Codec.decodeTfs(b.tfBytes)
      dls = Codec.decodeTfs(b.dlBytes)
      decodedBi = bi
      decodedBlocks += 1
      pi = 0
    }

    def curDoc: Long =
      if (exhausted) Long.MaxValue
      else if (decodedBi == bi) ids(pi)
      else blocks(bi).firstDocId

    /** Upper bound of this term's contribution for any doc in the current
      * block (exact block-max, evaluated under the CURRENT avgdl from the
      * stored (maxTf, minDl) integers). */
    def blockMax: Double =
      if (exhausted) 0.0
      else idf * Text.tfPartial(blocks(bi).maxTf, blocks(bi).minDl.toLong, avgdl)

    def blockLast: Long = if (exhausted) Long.MaxValue else blocks(bi).lastDocId

    def score: Double = { decode(); idf * Text.tfPartial(tfs(pi), dls(pi), avgdl) }

    /** Advance block pointer so blockLast >= target; metadata only. */
    def shallowTo(target: Long): Unit =
      while (!exhausted && blocks(bi).lastDocId < target) { bi += 1 }

    /** Advance to first posting with docId >= target. Stays metadata-only
      * when the landing block's firstDocId already satisfies the target —
      * a skip that lands at a block boundary never decodes the payload
      * (decode defers to the first deep access), so chained block skips
      * touch only block headers. */
    def advanceTo(target: Long): Unit = {
      shallowTo(target)
      if (!exhausted && !(decodedBi != bi && blocks(bi).firstDocId >= target)) {
        decode()
        if (ids(pi) < target) {
          var lo = pi; var hi = ids.length
          while (lo < hi) { // first index with ids >= target
            val mid = (lo + hi) >>> 1
            if (ids(mid) < target) lo = mid + 1 else hi = mid
          }
          pi = lo
          if (pi >= ids.length) { bi += 1; advanceTo(target) }
        }
      }
    }

    def next(): Unit = {
      decode()
      pi += 1
      if (pi >= ids.length) { bi += 1; pi = 0 }
    }
  }

  /** Accept/deny predicate over docIds for filtered search + tombstones
    * (jvector's Bits acceptOrds, util/Bits.java:32-96). */
  final class DocFilter(allowAll: Boolean, allow: java.util.HashSet[java.lang.Long],
                        deny: java.util.HashSet[java.lang.Long]) extends Serializable {
    @inline def accepts(d: Long): Boolean =
      (allowAll || allow.contains(d)) && !deny.contains(d)
  }
  object DocFilter {
    val All = new DocFilter(true, new java.util.HashSet(), new java.util.HashSet())
  }

  /** Exact top-k BM25 over one shard.
    * @param termBlocks per query term: (idf, blocks sorted by firstDocId)
    * @return hits (score desc, docId asc), at most k
    */
  /** @param after pagination cursor (jvector GraphSearcher.resume:223-311
    *   analog, stateless): only docs ranking strictly AFTER (score desc,
    *   docId asc) this hit enter the heap — searchAfter(page-N-last) is
    *   exactly page N+1. Pruning stays exact: θ comes from the heap of
    *   post-cursor hits only, so no qualifying doc is ever skipped. */
  def topK(termBlocks: Seq[(Double, Double, Array[Block])], k: Int,
           avgdl: Double, filter: DocFilter = DocFilter.All,
           seedThreshold: Double = Double.NegativeInfinity,
           after: ScoredDoc = null,
           stats: SearchStats = null): Array[ScoredDoc] = {
    val cursors = termBlocks
      .map { case (idf, ub, bs) => new TermCursor(idf, ub, bs, avgdl) }
      .toArray
    val heap = new DoubleTopK(k)
    var theta = seedThreshold

    val order = cursors.indices.toArray // sorted by curDoc each round
    var done = cursors.isEmpty

    while (!done) {
      // sort cursor order by current doc (tiny: |query terms| — insertion sort)
      var si = 1
      while (si < order.length) {
        val v = order(si); val vd = cursors(v).curDoc
        var sj = si - 1
        while (sj >= 0 && cursors(order(sj)).curDoc > vd) {
          order(sj + 1) = order(sj); sj -= 1
        }
        order(sj + 1) = v
        si += 1
      }

      theta = math.max(theta, heap.threshold)

      // pivot: first prefix whose Σ ub can beat θ (strict: later candidate
      // docs always have larger docIds, so a score tie loses the tie-break)
      var acc = 0.0
      var pivotIdx = -1
      var i = 0
      while (i < order.length && pivotIdx == -1) {
        acc += cursors(order(i)).ub
        if (acc > theta) pivotIdx = i
        i += 1
      }

      if (pivotIdx == -1 || cursors(order(pivotIdx)).curDoc == Long.MaxValue) {
        done = true
      } else {
        val pivotDoc = cursors(order(pivotIdx)).curDoc
        // extend pivot over cursors tied at pivotDoc: they contribute to
        // its score, so the block-max check must include them
        while (pivotIdx + 1 < order.length &&
               cursors(order(pivotIdx + 1)).curDoc == pivotDoc) pivotIdx += 1
        // block-max refinement: shallow-position blocks at pivotDoc.
        // NOTE shallowTo may push a cursor's curDoc PAST pivotDoc (its
        // remaining blocks all start later); such cursors contribute 0.
        var bmSum = 0.0
        var j = 0
        while (j <= pivotIdx) {
          val c = cursors(order(j)); c.shallowTo(pivotDoc)
          if (c.curDoc <= pivotDoc) bmSum += c.blockMax
          j += 1
        }
        if (bmSum <= theta && theta != Double.NegativeInfinity) {
          // no doc in these blocks can beat θ: jump past the nearest block
          // end (payloads of skipped blocks are never decoded)
          var d = Long.MaxValue
          var j2 = 0
          while (j2 <= pivotIdx) {
            val c = cursors(order(j2))
            if (c.curDoc <= pivotDoc) d = math.min(d, c.blockLast)
            j2 += 1
          }
          var target = if (d == Long.MaxValue) pivotDoc + 1 else d + 1
          // cap the jump by EVERY cursor already past the pivot — including
          // cursors that drifted there during shallow positioning (their
          // upcoming blocks were not in bmSum, so docs they cover from
          // their curDoc on cannot be skipped). target stays > pivotDoc.
          var jn = 0
          while (jn < order.length) {
            val cd = cursors(order(jn)).curDoc
            if (cd > pivotDoc && cd < target) target = cd
            jn += 1
          }
          // advance everything below target (the pivot cursor is < target,
          // so at least one cursor moves: guaranteed progress)
          if (Trace)
            println(s"SKIP pivot=$pivotDoc target=$target bmSum=$bmSum theta=$theta curDocs=${cursors.map(_.curDoc).mkString(",")}")
          var j3 = 0
          while (j3 < order.length) {
            val c = cursors(order(j3))
            if (c.curDoc < target) c.advanceTo(target)
            j3 += 1
          }
        } else {
          // bring every lagging cursor up to the pivot (WAND invariant:
          // no doc below pivotDoc can beat θ, so nothing is skipped)
          var moved = false
          var j4 = 0
          while (j4 < order.length) {
            val c = cursors(order(j4))
            if (c.curDoc < pivotDoc) { c.advanceTo(pivotDoc); moved = true }
            j4 += 1
          }
          if (!moved) {
            // all cursors >= pivotDoc; the pivot cursor itself sits exactly
            // on pivotDoc (shallowTo never moves a cursor off its current
            // doc), so score it and step those cursors — progress
            if (filter.accepts(pivotDoc)) {
              // sum in cursor-array (term-sorted) order, NOT doc-sorted
              // order: fp addition isn't associative, and ties must break
              // identically for every doc (SURVEY.md §7.3 rank-identity)
              var s = 0.0
              var j5 = 0
              while (j5 < cursors.length) {
                if (cursors(j5).curDoc == pivotDoc) s += cursors(j5).score
                j5 += 1
              }
              if (Trace)
                println(s"SCORE doc=$pivotDoc s=$s theta=$theta")
              if (after == null || s < after.score ||
                  (s == after.score && pivotDoc > after.docId))
                heap.offer(s, pivotDoc)
            }
            var j6 = 0
            while (j6 < order.length) {
              if (cursors(order(j6)).curDoc == pivotDoc) cursors(order(j6)).next()
              j6 += 1
            }
          }
        }
      }
    }
    if (stats != null) {
      stats.decodedBlocks += cursors.map(_.decodedBlocks).sum
      stats.totalBlocks += termBlocks.map(_._3.length.toLong).sum
    }
    heap.drain().map { case (s, d) => ScoredDoc(d, s) }
  }

  /** Block-decode counters for a threshold/topK run — lets callers (and
    * tests) assert that block-max pruning actually skipped payloads. */
  final class SearchStats { var decodedBlocks = 0L; var totalBlocks = 0L }

  /** All docs with BM25 score >= tau over one shard (threshold query, the
    * analog of jvector's similarity-threshold search GraphSearcher.java:112-115
    * — but exact here). Same pivot/skip machinery as [[topK]] with θ pinned
    * to τ (no heap): any run of blocks whose Σ blockMax < τ is jumped over
    * without decoding its payload bytes, so threshold queries over frequent
    * terms touch only blocks that can reach τ. */
  def threshold(termBlocks: Seq[(Double, Double, Array[Block])], tau: Double,
                avgdl: Double, filter: DocFilter = DocFilter.All,
                stats: SearchStats = null): Iterator[ScoredDoc] = {
    val cursors = termBlocks
      .map { case (idf, ub, bs) => new TermCursor(idf, ub, bs, avgdl) }
      .toArray
    def fillStats(): Unit = if (stats != null) {
      stats.decodedBlocks = cursors.map(_.decodedBlocks).sum
      stats.totalBlocks = termBlocks.map(_._3.length.toLong).sum
    }
    val sumUb = cursors.map(_.ub).sum
    if (cursors.isEmpty || sumUb < tau) { fillStats(); return Iterator.empty }
    val out = scala.collection.mutable.ArrayBuffer[ScoredDoc]()
    val order = cursors.indices.toArray // sorted by curDoc each round
    var done = false
    while (!done) {
      var si = 1
      while (si < order.length) {
        val v = order(si); val vd = cursors(v).curDoc
        var sj = si - 1
        while (sj >= 0 && cursors(order(sj)).curDoc > vd) {
          order(sj + 1) = order(sj); sj -= 1
        }
        order(sj + 1) = v
        si += 1
      }
      // pivot: first prefix whose Σ ub can REACH τ (>= — equality qualifies)
      var acc = 0.0
      var pivotIdx = -1
      var i = 0
      while (i < order.length && pivotIdx == -1) {
        acc += cursors(order(i)).ub
        if (acc >= tau) pivotIdx = i
        i += 1
      }
      if (pivotIdx == -1 || cursors(order(pivotIdx)).curDoc == Long.MaxValue) {
        done = true
      } else {
        val pivotDoc = cursors(order(pivotIdx)).curDoc
        while (pivotIdx + 1 < order.length &&
               cursors(order(pivotIdx + 1)).curDoc == pivotDoc) pivotIdx += 1
        // block-max refinement at pivotDoc (see topK for the shallow-drift
        // caveats — identical structure, θ := τ with >= acceptance)
        var bmSum = 0.0
        var j = 0
        while (j <= pivotIdx) {
          val c = cursors(order(j)); c.shallowTo(pivotDoc)
          if (c.curDoc <= pivotDoc) bmSum += c.blockMax
          j += 1
        }
        if (bmSum < tau) {
          // no doc covered by these blocks can reach τ: jump past the
          // nearest block end, capped by every cursor past the pivot
          var d = Long.MaxValue
          var j2 = 0
          while (j2 <= pivotIdx) {
            val c = cursors(order(j2))
            if (c.curDoc <= pivotDoc) d = math.min(d, c.blockLast)
            j2 += 1
          }
          var target = if (d == Long.MaxValue) pivotDoc + 1 else d + 1
          var jn = 0
          while (jn < order.length) {
            val cd = cursors(order(jn)).curDoc
            if (cd > pivotDoc && cd < target) target = cd
            jn += 1
          }
          var j3 = 0
          while (j3 < order.length) {
            val c = cursors(order(j3))
            if (c.curDoc < target) c.advanceTo(target)
            j3 += 1
          }
        } else {
          var moved = false
          var j4 = 0
          while (j4 < order.length) {
            val c = cursors(order(j4))
            if (c.curDoc < pivotDoc) { c.advanceTo(pivotDoc); moved = true }
            j4 += 1
          }
          if (!moved) {
            if (filter.accepts(pivotDoc)) {
              // term-order summation for reproducible fp (see topK)
              var s = 0.0
              var j5 = 0
              while (j5 < cursors.length) {
                if (cursors(j5).curDoc == pivotDoc) s += cursors(j5).score
                j5 += 1
              }
              if (s >= tau) out += ScoredDoc(pivotDoc, s)
            }
            var j6 = 0
            while (j6 < order.length) {
              if (cursors(order(j6)).curDoc == pivotDoc) cursors(order(j6)).next()
              j6 += 1
            }
          }
        }
      }
    }
    fillStats()
    out.iterator
  }
}
