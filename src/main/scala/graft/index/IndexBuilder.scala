package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Codec, Text}

/** SPIMI-style index build over typed Datasets (SURVEY.md §3.2 "our
  * equivalent"): the Spark re-architecture of jvector's parallel bulk
  * build (GraphIndexBuilder.build, graph/GraphIndexBuilder.java:156-166) —
  * Spark stage boundaries replace its ForkJoinPool + lock-free CAS
  * machinery; each capability maps to a declarative stage:
  *
  *  1. dense docId assignment: repartitionByRange(url) + per-partition
  *     counts + prefix-sum offsets (NOT row_number over a single partition,
  *     NOT monotonically_increasing_id — ordinal renumbering, jvector
  *     OnDiskGraphIndexWriter.getSequentialRenumbering:163-176);
  *  2. tokenize + per-doc tf: narrow mapPartitions, no shuffle (tf is
  *     doc-local by definition — the SPIMI insight);
  *  3. global stats (N, avgdl): one tiny aggregate (the medioid/centroid
  *     refresh analog, GraphIndexBuilder.approximateMedioid:552-576);
  *  4. posting merge: repartitionByRange(term, shard, docId) — the range
  *     partitioner's sampled split points cut head terms (Zipf skew) across
  *     partitions at docId boundaries, which is the salting: the docId
  *     subrange is the salt key, and no second-level merge is needed
  *     because blocks are self-contained docId runs;
  *  5. block encode: delta-gap + varbyte (Codec) with exact block-max
  *     metadata; dictionary aggregate (map-side partial combine).
  *
  * The chunked variant (buildResumable) writes one segment dir + manifest
  * row per docId-range chunk; a restart skips committed chunks — the
  * incremental-write / resume protocol of jvector's on-disk writer
  * (OnDiskGraphIndexWriter.writeInline:62-84, proven incremental ≡ bulk in
  * TestOnDiskGraphIndex.java:215-262, which our resume test mirrors).
  */
object IndexBuilder {

  final case class Options(
      numShards: Int = 32,
      rangePartitions: Int = 32,
      blockSize: Int = Codec.BlockSize,
      quantizedBounds: Boolean = false,
      docOrder: String = "url")

  /** Sort keys that define docId assignment order (stage 1).
    *
    *  - "url" (default): lexicographic url — the web-standard layout;
    *    clusters same-site pages for delta-gap compression.
    *  - "length": (hash(url) % numShards, docLen, url) — score-clustered
    *    layout (the standard document-reordering remedy, cf. Ding & Suel's
    *    BMW observation that docId assignment bounds block-max tightness).
    *    BM25's length normalization makes per-block score bounds track doc
    *    length, so sorting by length makes blockMax DECLINE across a docId
    *    range and lets WAND's θ prune head-term blocks — with random/url
    *    order every 128-posting block of a head term contains a short doc,
    *    blockMax ≈ global max everywhere, and no θ can skip (measured ~0%
    *    on same-df conjunctions, BASELINE.md round 3). The leading
    *    hash-bucket key matters: shards are contiguous docId ranges and
    *    each runs WAND with its OWN θ, so the length decline must happen
    *    WITHIN each shard's range, not globally (a global length sort just
    *    makes every shard internally uniform again — measured zero skip).
    *    Results stay score-identical per url: scores depend on (tf, df,
    *    dl), never on docId; only tie ORDER among equal scores can differ.
    */
  private[graft] def orderCols(opts: Options): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, pmod, udf, xxhash64}
    if (opts.docOrder == "length")
      Seq(pmod(xxhash64(col("url")), lit(opts.numShards.toLong)),
        udf((t: String) => Text.countTokens(t)).apply(col("text")), col("url"))
    else Seq(col("url"))
  }

  /** Lossy-but-admissible block-bound quantization (the C5 uint8 option;
    * reference analog: jvector pq/LocallyAdaptiveVectorQuantization
    * .java:72-99 — lossy bound metadata, exact rerank preserved). Values
    * keep at most 4 significant bits (a 4-bit mantissa + exponent ≈ one
    * byte per value): maxTf rounds UP and minDl rounds DOWN, so the
    * block's computed upper bound can only grow — WAND pruning stays
    * admissible and results remain rank-identical (scoring always decodes
    * the exact per-posting tf/dl payloads; only skip decisions read the
    * bounds). Cost: bounds are up to 1/8 looser, so marginally fewer
    * blocks skip; gain: block metadata collapses to ~128 distinct codes,
    * which parquet RLE/varint encodes into a fraction of the exact bytes
    * at 10^12-doc metadata volume. */
  object Quant {
    private def shiftOf(v: Int): Int = {
      val bits = 32 - Integer.numberOfLeadingZeros(v)
      if (bits <= 4) 0 else bits - 4
    }
    /** Smallest value >= v with at most 4 significant bits. */
    def ceil4(v: Int): Int = {
      if (v <= 0) return v
      val s = shiftOf(v)
      ((v + (1 << s) - 1) >> s) << s
    }
    /** Largest value <= v with at most 4 significant bits. */
    def floor4(v: Int): Int = {
      if (v <= 0) return v
      (v >> shiftOf(v)) << shiftOf(v)
    }
  }

  /** Apply bound quantization to a block's metadata (payloads untouched). */
  def quantizeBlock(b: Block): Block =
    b.copy(maxTf = Quant.ceil4(b.maxTf), minDl = Quant.floor4(b.minDl))

  /** Normalize an input table to (url, text, lang); html-only inputs run
    * the frozen extractor. */
  def normalize(spark: SparkSession, webpages: DataFrame): DataFrame = {
    import spark.implicits._
    val cols = webpages.columns.toSet
    val withText =
      if (cols.contains("text")) webpages
      else webpages.withColumn("text",
        udf((h: Array[Byte]) => Text.extract(new String(h, "UTF-8")))
          .apply($"html"))
    withText.select($"url",
      $"text",
      (if (cols.contains("lang")) coalesce($"lang", lit("")) else lit(""))
        .as("lang"))
  }

  /** One-shot build. Input must have (url, text|html, lang?). */
  def build(spark: SparkSession, webpages: DataFrame,
            opts: Options = Options()): InvertedIndex = {
    import spark.implicits._
    val in = normalize(spark, webpages).as[(String, String, String)]

    // --- stage 1: deterministic dense docIds ---
    val parts = opts.rangePartitions
    val oc = orderCols(opts)
    val sorted = in.repartitionByRange(parts, oc: _*).sortWithinPartitions(oc: _*)
      .persist()
    val counts = sorted.mapPartitions { it =>
      Iterator((TaskContext.getPartitionId(), it.size.toLong))
    }.collect().toMap
    val offsets = new Array[Long](parts + 1)
    (0 until parts).foreach { p =>
      offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L)
    }
    val numDocs = offsets(parts)
    val nShards = opts.numShards
    val offB = spark.sparkContext.broadcast(offsets)
    @inline def shardOf(docId: Long): Int =
      if (numDocs == 0) 0
      else math.min(nShards - 1, (docId * nShards / numDocs).toInt)

    // --- stage 2a: doc metadata (docLen) — narrow ---
    val docs = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = offB.value(pid)
      it.map { case (url, text, lang) =>
        val d = DocMeta(i, shardOf(i), url, Text.countTokens(text), lang)
        i += 1
        d
      }
    }.persist()

    // --- stage 3: global stats (tiny agg) ---
    val (totTok) = if (numDocs == 0) 0L
      else docs.agg(sum($"docLen")).as[Long].head()
    val avgdl = if (numDocs == 0) 0.0 else totTok.toDouble / numDocs
    val stats = IndexStats(numDocs, totTok, avgdl, nShards)

    // --- stages 2b+4+5: SPIMI partial-run inversion + compact merge ---
    val blocks = spimiBlocks(sorted, offB, numDocs, nShards,
      (0L, Long.MaxValue), opts).persist()

    // --- dictionary: df/cf/bound inputs per term (map-side combined agg) ---
    val dict = dictFromBlocks(spark, blocks).persist()

    // force caches before dropping the sorted input: repartitionByRange
    // re-samples on recompute, so lineage replay must never re-run it
    blocks.count(); dict.count()
    sorted.unpersist()
    InvertedIndex(spark, docs, blocks, dict, stats)
  }

  /** Dictionary from blocks: df = Σ block n (one posting per doc), cf from
    * decoded tfs, (maxTf, minDl) = global tf-part bound inputs. Map-side
    * partial aggregation is automatic (hash agg). */
  def dictFromBlocks(spark: SparkSession, blocks: Dataset[Block]): Dataset[DictEntry] = {
    import spark.implicits._
    blocks.groupBy($"term").agg(
      sum($"n").cast("long").as("df"),
      sum($"tfSum").cast("long").as("cf"),
      max($"maxTf").as("maxTf"),
      min($"minDl").as("minDl"))
      .as[DictEntry]
  }

  /** Stages 4+5 shared by the small/streaming build paths: sort-merge raw
    * posting rows into self-contained compressed blocks.
    *
    * Hash-partitioned on (term, shard): a (term, shard) posting run never
    * splits across partitions, so the block decomposition is a pure
    * function of the run content — the resumable build's "incremental ≡
    * bulk" byte-equality depends on this. Head-term (Zipf) skew is handled
    * because `shard` acts as the salt: the heaviest term spreads over
    * numShards partitions (the explicit salted merge of SURVEY.md §7.1.4;
    * jvector merge analog NodeArray.merge:52-132). */
  private[graft] def encodeBlocks(spark: SparkSession, postings: Dataset[Posting],
                                  opts: Options): Dataset[Block] = {
    import spark.implicits._
    val bs = opts.blockSize
    val cut = postings
      .repartition(opts.rangePartitions, $"term", $"shard")
      .sortWithinPartitions($"term", $"shard", $"docId")
      .mapPartitions { it =>
        new BlockCutter(it, bs)
      }
    if (opts.quantizedBounds) cut.map(quantizeBlock) else cut
  }

  /** SPIMI proper, the bulk path: invert each input partition into
    * COMPRESSED partial runs first (per-partition term hashmap, spilled as
    * delta-varbyte blocks when the posting budget is hit — the classic
    * single-pass-in-memory-indexing spill), then shuffle only those
    * compact runs and merge each (term, shard)'s runs into the final
    * 128-posting blocks. Vs shuffling raw (term, docId, tf, dl) rows this
    * moves ~10x fewer bytes — the difference between a merge that is
    * shuffle-bound and one that is tokenize-bound at 100 TB.
    *
    * Runs from different input partitions cover disjoint increasing docId
    * ranges (docIds are positional in the url-sorted input), so the merge
    * is concatenation-after-sort-by-firstDocId; the final block layout is
    * a pure function of each (term, shard)'s full posting run —
    * independent of partitioning, chunking, and spill points — which is
    * what makes resumed ≡ one-shot byte-identical. */
  private[graft] def spimiBlocks(
      sorted: Dataset[(String, String, String)],
      offsets: org.apache.spark.broadcast.Broadcast[Array[Long]],
      numDocs: Long, nShards: Int,
      keepRange: (Long, Long), opts: Options,
      spillBudget: Int = 1000000): Dataset[Block] = {
    import sorted.sparkSession.implicits._
    val bs = opts.blockSize
    val (dLo, dHi) = keepRange
    val partial: Dataset[Block] = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      // whole-partition pruning: if this partition's docId range is
      // disjoint from the chunk's, never pull the iterator — rows are
      // not deserialized and the lazy parquet scan does no work
      if (pid + 1 < offsets.value.length &&
          (offsets.value(pid + 1) <= dLo || offsets.value(pid) >= dHi)) {
        Iterator.empty
      } else spimiPartition(it, offsets.value(pid), dLo, dHi, numDocs, nShards, spillBudget)
    }
    val merged = mergeRuns(partial, bs)
    if (opts.quantizedBounds) merged.map(quantizeBlock) else merged
  }

  private def spimiPartition(it: Iterator[(String, String, String)], base: Long,
                             dLo: Long, dHi: Long, numDocs: Long, nShards: Int,
                             spillBudget: Int): Iterator[Block] = {
      var i = base
      val map = new TermMap
      var out = List.empty[Iterator[Block]]
      def flush(): Unit = if (map.pending > 0) {
        val runs = new scala.collection.mutable.ArrayBuffer[Block](map.size)
        map.foreachEntry((term, buf) => buf.emitRuns(term, runs))
        map.clear()
        out = runs.iterator :: out
      }
      // Streaming ASCII path: occurrences flow straight into the partition-
      // level TermMap (tf aggregated at the tail of each term's PostBuf —
      // all occurrences of (term, doc) arrive before any later doc's). No
      // per-doc hashmap, no tuple array, no sort, and a String is allocated
      // once per DISTINCT term per partition, not once per occurrence —
      // the allocation (= GC stop-the-world = serial fraction) of the build
      // hot path drops ~an order of magnitude. Final block bytes are
      // unchanged: mergeRuns sorts runs by firstDocId, so partial-run emit
      // order never reaches the layout (the resumed ≡ one-shot byte test
      // pins this).
      val sink = new Text.TokenSink {
        var shard = 0
        var docId = 0L
        var dl = 0
        def token(buf: Array[Char], len: Int): Unit =
          map.getOrInsert(buf, len).addOcc(map, shard, docId, dl)
      }
      it.foreach { case (_, text, _) =>
        val docId = i; i += 1
        if (docId >= dLo && docId < dHi) {
          val shard =
            if (numDocs == 0) 0
            else math.min(nShards - 1, (docId * nShards / numDocs).toInt)
          sink.shard = shard; sink.docId = docId
          sink.dl = Text.countTokens(text)
          if (Text.tokenizeInto(text, sink) < 0) {
            // non-ASCII doc: frozen termFreqs fallback, same map
            val (tfs, len) = Text.termFreqs(text)
            sink.dl = len
            var t = 0
            while (t < tfs.length) {
              val (term, tf) = tfs(t)
              map.getOrInsert(term).add(shard, docId, tf, len)
              map.pending += 1
              t += 1
            }
          }
          if (map.pending >= spillBudget) flush()
        }
      }
      flush()
      out.reverse.iterator.flatten
  }

  /** Open-addressed interning map term -> PostBuf for the SPIMI pass.
    * Probed with raw token chars (String.hashCode-compatible), so the hot
    * loop allocates nothing on a hit. Linear probing, power-of-2 capacity,
    * grown at 70% load. */
  private final class TermMap {
    private var cap = 1 << 15
    private var mask = cap - 1
    private var keys = new Array[String](cap)
    private var vals = new Array[PostBuf](cap)
    var size = 0
    var pending = 0L // postings buffered since last flush (spill budget)
    private def slot(h0: Int): Int = (h0 ^ (h0 >>> 16)) & mask
    def getOrInsert(buf: Array[Char], n: Int): PostBuf = {
      var h = 0
      var i = 0
      while (i < n) { h = 31 * h + buf(i); i += 1 }
      var idx = slot(h)
      while (true) {
        val k = keys(idx)
        if (k == null) {
          val term = new String(buf, 0, n)
          val b = new PostBuf
          keys(idx) = term; vals(idx) = b; size += 1
          if (size * 10 > cap * 7) grow()
          return b
        }
        if (k.length == n && { var j = 0
            while (j < n && k.charAt(j) == buf(j)) j += 1; j == n })
          return vals(idx)
        idx = (idx + 1) & mask
      }
      null // unreachable
    }
    def getOrInsert(term: String): PostBuf = {
      var idx = slot(term.hashCode)
      while (true) {
        val k = keys(idx)
        if (k == null) {
          val b = new PostBuf
          keys(idx) = term; vals(idx) = b; size += 1
          if (size * 10 > cap * 7) grow()
          return b
        }
        if (k == term || k.equals(term)) return vals(idx)
        idx = (idx + 1) & mask
      }
      null // unreachable
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap *= 2; mask = cap - 1
      keys = new Array[String](cap)
      vals = new Array[PostBuf](cap)
      var i = 0
      while (i < ok.length) {
        val k = ok(i)
        if (k != null) {
          var idx = slot(k.hashCode)
          while (keys(idx) != null) idx = (idx + 1) & mask
          keys(idx) = k; vals(idx) = ov(i)
        }
        i += 1
      }
    }
    def foreachEntry(f: (String, PostBuf) => Unit): Unit = {
      var i = 0
      while (i < cap) {
        if (keys(i) != null) f(keys(i), vals(i))
        i += 1
      }
    }
    def clear(): Unit = {
      java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(vals.asInstanceOf[Array[AnyRef]], null)
      size = 0; pending = 0
    }
  }

  /** Merge each (term, shard)'s disjoint partial runs into final blocks. */
  private def mergeRuns(partial: Dataset[Block], bs: Int): Dataset[Block] = {
    import partial.sparkSession.implicits._
    partial.groupByKey(b => (b.term, b.shard)).flatMapGroups {
      (key: (String, Int), runs: Iterator[Block]) =>
        val (term, shard) = key
        val rs = runs.toArray.sortBy(_.firstDocId)
        if (rs.length == 1 && rs(0).n <= bs) Iterator(rs(0))
        else {
          val total = rs.map(_.n).sum
          val ids = new Array[Long](total)
          val tfs = new Array[Int](total)
          val dls = new Array[Int](total)
          var o = 0
          rs.foreach { r =>
            val rIds = Codec.decodeDocIds(r.docBytes, -1L)
            val rTfs = Codec.decodeTfs(r.tfBytes)
            val rDls = Codec.decodeTfs(r.dlBytes)
            System.arraycopy(rIds, 0, ids, o, rIds.length)
            System.arraycopy(rTfs, 0, tfs, o, rTfs.length)
            System.arraycopy(rDls, 0, dls, o, rDls.length)
            o += rIds.length
          }
          (0 until total by bs).iterator.map { lo =>
            val hi = math.min(lo + bs, total)
            encodeBlock(term, shard, ids.slice(lo, hi), tfs.slice(lo, hi),
              dls.slice(lo, hi))
          }
        }
    }
  }

  /** Per-term growable posting buffer for the SPIMI pass; docIds (and
    * therefore shards) arrive in increasing order. */
  private final class PostBuf {
    private var shards = new Array[Int](4)
    private var ids = new Array[Long](4)
    private var tfs = new Array[Int](4)
    private var dls = new Array[Int](4)
    private var n = 0
    def add(shard: Int, docId: Long, tf: Int, dl: Int): Unit = {
      if (n == ids.length) {
        val c = n * 2
        shards = java.util.Arrays.copyOf(shards, c)
        ids = java.util.Arrays.copyOf(ids, c)
        tfs = java.util.Arrays.copyOf(tfs, c)
        dls = java.util.Arrays.copyOf(dls, c)
      }
      shards(n) = shard; ids(n) = docId; tfs(n) = tf; dls(n) = dl
      n += 1
    }
    /** One streamed occurrence: aggregate into the tail posting when it is
      * the same doc (all of a doc's occurrences of this term arrive
      * consecutively), else append a new posting and charge the spill
      * budget. */
    def addOcc(m: TermMap, shard: Int, docId: Long, dl: Int): Unit = {
      if (n > 0 && ids(n - 1) == docId) tfs(n - 1) += 1
      else { add(shard, docId, 1, dl); m.pending += 1 }
    }
    /** One compressed run per shard boundary (shards are non-decreasing). */
    def emitRuns(term: String, out: scala.collection.mutable.ArrayBuffer[Block]): Unit = {
      var lo = 0
      while (lo < n) {
        var hi = lo + 1
        while (hi < n && shards(hi) == shards(lo)) hi += 1
        out += encodeBlock(term, shards(lo),
          java.util.Arrays.copyOfRange(ids, lo, hi),
          java.util.Arrays.copyOfRange(tfs, lo, hi),
          java.util.Arrays.copyOfRange(dls, lo, hi))
        lo = hi
      }
    }
  }

  /** Streaming block cutter over (term, shard, docId)-sorted postings. */
  private final class BlockCutter(it: Iterator[Posting], blockSize: Int)
      extends Iterator[Block] {
    private val buf = new scala.collection.mutable.ArrayBuffer[Posting](blockSize)
    private var pending: Posting = if (it.hasNext) it.next() else null
    override def hasNext: Boolean = pending != null
    override def next(): Block = {
      val t = pending.term; val s = pending.shard
      buf.clear()
      while (pending != null && pending.term == t && pending.shard == s &&
             buf.length < blockSize) {
        buf += pending
        pending = if (it.hasNext) it.next() else null
      }
      encodeBlock(t, s, buf.map(_.docId).toArray, buf.map(_.tf).toArray,
        buf.map(_.docLen).toArray)
    }
  }

  /** Encode one self-contained block. (maxTf, minDl) give the block-max
    * bound inputs; a (maxTf, minDl) pair dominates every posting because
    * tfPartial is monotone up in tf and down in docLen. */
  def encodeBlock(term: String, shard: Int, ids: Array[Long], tfs: Array[Int],
                  dls: Array[Int]): Block = {
    var maxTf = 0
    var minDl = Int.MaxValue
    var tfSum = 0L
    var i = 0
    while (i < ids.length) {
      if (tfs(i) > maxTf) maxTf = tfs(i)
      if (dls(i) < minDl) minDl = dls(i)
      tfSum += tfs(i)
      i += 1
    }
    Block(term, Model.bucketOf(term), shard, ids.head, ids.last, ids.length,
      Codec.encodeDocIds(ids, -1L), Codec.encodeTfs(tfs), Codec.encodeTfs(dls),
      maxTf, minDl, tfSum)
  }
}
