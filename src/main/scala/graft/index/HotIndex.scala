package graft.index

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel
import graft.core.{DoubleTopK, Text}

/** Long-lived serving handle over a built index — the engine's analog of
  * the reference's resident query service (jvector
  * jvector-examples/.../IPCService.java:325-368 serves from a graph held
  * hot in memory; graph/disk/CachingGraphIndex.java:29-46 caches the hot
  * region near the entry point).
  *
  * The batch/search DataFrame path re-plans through Catalyst per query —
  * right for throughput, wrong for a serving loop where planning dominates
  * (~100 ms/query). Here the index is materialized ONCE as a cached RDD of
  * per-partition `term -> blocks` hash maps (shard-co-located, so one WAND
  * run per partition is valid: shards are disjoint increasing docId
  * ranges); a query is then a single `sc.runJob` over those cached maps —
  * per-term O(1) lookup + the WAND kernel + a driver-side k-way merge, no
  * per-query planning, shuffle, or scan. The query plan itself (idf +
  * upper bound per term) comes from the driver-resident hot dictionary.
  *
  * This is the one deliberately non-declarative surface of the engine
  * (SURVEY §2.4 P5): serving latency is a per-partition imperative
  * problem, and the RDD is built from the same Dataset[Block] the batch
  * path queries — one format, two access paths.
  */
final class HotIndex private (
    ix: InvertedIndex,
    parts: RDD[java.util.HashMap[String, Array[Block]]]) {

  def stats: IndexStats = ix.stats

  /** Build the kernel filter from serving-side id sets, enforcing the
    * closure-size guard: these arrays ship with EVERY job closure, so they
    * are meant for the "small live set" regime — a caller holding 10⁷
    * tombstones must compact (the durable path) instead of silently
    * serializing them into each query. */
  private def mkFilter(allow: Array[Long], deny: Array[Long]): Wand.DocFilter = {
    require(deny.length <= HotIndex.FilterSetCap,
      s"deny set of ${deny.length} docIds exceeds the serving closure cap " +
      s"(${HotIndex.FilterSetCap}); compact() the index instead of shipping " +
      "tombstones with every query")
    require(allow == null || allow.length <= HotIndex.FilterSetCap,
      s"allow set of ${allow.length} docIds exceeds the serving closure cap " +
      s"(${HotIndex.FilterSetCap}); use the DataFrame path (search with a " +
      "docFilter predicate) for large metadata filters")
    if (allow == null && deny.isEmpty) Wand.DocFilter.All
    else {
      val a = new java.util.HashSet[java.lang.Long]()
      if (allow != null) allow.foreach(a.add(_))
      val d = new java.util.HashSet[java.lang.Long]()
      deny.foreach(d.add(_))
      new Wand.DocFilter(allow == null, a, d)
    }
  }

  /** Exact top-k BM25, rank-identical to [[InvertedIndex.search]]:
    * (score desc, docId asc).
    * @param deny tombstoned docIds excluded from results (the serving-path
    *   twin of the batch path's tombstone Dataset; ships with the job
    *   closure — meant for the usual "small live deny set" regime, with
    *   compaction + a fresh HotIndex as the durable path). */
  def search(query: String, k: Int, deny: Array[Long] = Array.emptyLongArray): Array[ScoredDoc] =
    searchAll(Seq((0, query)), k, deny).headOption.map(_._2).getOrElse(Array.empty)

  /** Accept-list serving twin of [[InvertedIndex.search]] with a docFilter:
    * only docIds in `allow` (minus `deny`) are scored. The caller resolves
    * its metadata predicate to ids once (e.g. from a driver-held doc map);
    * large predicates belong on the DataFrame path. */
  def searchFiltered(query: String, k: Int, allow: Array[Long],
                     deny: Array[Long] = Array.emptyLongArray): Array[ScoredDoc] =
    runTopK(Seq((0, query)), k, mkFilter(allow, deny), null)
      .headOption.map(_._2).getOrElse(Array.empty)

  /** Pagination serving twin of [[InvertedIndex.searchAfter]]: exact top-k
    * among docs ranking strictly after (afterScore, afterDocId). */
  def searchAfter(query: String, k: Int, afterScore: Double, afterDocId: Long,
                  deny: Array[Long] = Array.emptyLongArray): Array[ScoredDoc] =
    runTopK(Seq((0, query)), k, mkFilter(null, deny),
      ScoredDoc(afterDocId, afterScore)).headOption.map(_._2).getOrElse(Array.empty)

  /** Threshold serving twin of [[InvertedIndex.searchThreshold]]: ALL docs
    * with score >= tau, (score desc, docId asc). Same block-max skip
    * machinery with θ pinned to τ.
    *
    * Result-size guard (mirror of [[HotIndex.FilterSetCap]]): the serving
    * path materializes the full result set on the DRIVER, so a low τ on a
    * head term would otherwise pull O(corpus) rows into driver memory.
    * Each partition checks its own hit count BEFORE shipping results and
    * fails loudly past `maxResults` — bulk threshold scans belong on the
    * distributed DataFrame path ([[InvertedIndex.searchThreshold]]). */
  def searchThreshold(query: String, tau: Double,
                      deny: Array[Long] = Array.emptyLongArray,
                      maxResults: Int = HotIndex.ThresholdResultCap): Array[ScoredDoc] = {
    val plan = ix.queryPlanFor(query)
    if (plan.isEmpty) return Array.empty
    val filter = mkFilter(null, deny)
    val avgdl = ix.stats.avgdl
    val cap = maxResults
    val perPart: Array[Array[ScoredDoc]] =
      ix.spark.sparkContext.runJob(parts,
        (it: Iterator[java.util.HashMap[String, Array[Block]]]) =>
          if (!it.hasNext) Array.empty[ScoredDoc]
          else {
            val termBlocks = HotIndex.planBlocks(plan, it.next())
            val hits = Wand.threshold(termBlocks, tau, avgdl, filter)
            require(hits.size <= cap,
              s"threshold query matched ${hits.size} docs in one partition, " +
              s"over the serving result cap ($cap); run bulk threshold scans " +
              "on the DataFrame path (InvertedIndex.searchThreshold)")
            hits.toArray
          })
    val all = perPart.flatten
    require(all.length <= cap,
      s"threshold query matched ${all.length} docs, over the serving result " +
      s"cap ($cap); run bulk threshold scans on the DataFrame path " +
      "(InvertedIndex.searchThreshold)")
    scala.util.Sorting.stableSort(all,
      (x: ScoredDoc, y: ScoredDoc) =>
        x.score > y.score || (x.score == y.score && x.docId < y.docId))
    all
  }

  /** Batch serving: ONE job scores every query against each partition's
    * term map (shared scan, jvector SiftSmall.java:92-113 parallel batch
    * analog); returns per-query exact top-k. */
  def searchAll(queries: Seq[(Int, String)], k: Int,
                deny: Array[Long] = Array.emptyLongArray): Seq[(Int, Array[ScoredDoc])] =
    runTopK(queries, k, mkFilter(null, deny), null)

  private def runTopK(queries: Seq[(Int, String)], k: Int,
                      filter: Wand.DocFilter,
                      after: ScoredDoc): Seq[(Int, Array[ScoredDoc])] = {
    val plans = queries.map { case (qid, q) => (qid, ix.queryPlanFor(q)) }
    if (k <= 0 || plans.forall(_._2.isEmpty)) return plans.map(p => (p._1, Array.empty[ScoredDoc]))
    val avgdl = ix.stats.avgdl
    val kk = k
    val perPart: Array[Seq[(Int, Array[ScoredDoc])]] =
      ix.spark.sparkContext.runJob(parts,
        (it: Iterator[java.util.HashMap[String, Array[Block]]]) =>
          if (!it.hasNext) Seq.empty[(Int, Array[ScoredDoc])]
          else {
            val m = it.next()
            plans.map { case (qid, plan) =>
              (qid, Wand.topK(HotIndex.planBlocks(plan, m), kk, avgdl, filter,
                after = after))
            }
          })
    // tiny driver merge: numPartitions × k candidates per query, grouped
    // once so the merge is O(Q·P), not O(Q²·P)
    val byQid = new java.util.HashMap[Int, DoubleTopK]()
    plans.foreach { case (qid, _) => byQid.put(qid, new DoubleTopK(k)) }
    perPart.foreach(_.foreach { case (q, hits) =>
      val heap = byQid.get(q)
      hits.foreach(sd => heap.offer(sd.score, sd.docId))
    })
    plans.map { case (qid, _) =>
      (qid, byQid.get(qid).drain().map { case (s, d) => ScoredDoc(d, s) })
    }
  }

  def close(): Unit = parts.unpersist()
}

object HotIndex {
  /** Max docIds a serving-path allow/deny array may hold: ~8 MB of longs,
    * serialized into EVERY query's job closure. Larger sets must go
    * through compaction (deny) or the DataFrame path (allow). */
  val FilterSetCap = 1000000

  /** Max rows a serving-path threshold query may return: results land in
    * ONE driver array, so unbounded τ-scans must use the DataFrame path. */
  val ThresholdResultCap = 1000000

  /** One query's (idf, ub, blocks) list from a partition's term map —
    * shared by every serving kernel. */
  private[index] def planBlocks(plan: Map[String, (Double, Double)],
      m: java.util.HashMap[String, Array[Block]]): Seq[(Double, Double, Array[Block])] =
    plan.toSeq.sortBy(_._1).flatMap { case (t, (idf, ub)) =>
      Option(m.get(t)).map(bs => (idf, ub, bs))
    }

  /** Materialize the serving cache: one `term -> firstDocId-sorted blocks`
    * map per partition, built from the shard-partitioned block Dataset and
    * pinned in executor memory. */
  def apply(ix0: InvertedIndex, numPartitions: Int = 0): HotIndex = {
    val ix = if (ix0.hotDict != null) ix0 else ix0.withHotDict()
    val sc = ix.spark.sparkContext
    // never exceed the shard count: blocks hash-partition by shard, so
    // partitions beyond numShards are structurally EMPTY yet still cost a
    // scheduled task in every runJob — pure per-query latency overhead
    val p = if (numPartitions > 0) numPartitions
            else math.max(1, math.min(sc.defaultParallelism, ix.stats.numShards))
    val parts = ix.blocks.rdd
      .map(b => (b.shard, b))
      .partitionBy(new HashPartitioner(p))
      .mapPartitions({ it =>
        val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Block]]()
        it.foreach { case (_, b) =>
          m.computeIfAbsent(b.term,
            _ => new scala.collection.mutable.ArrayBuffer[Block]()) += b
        }
        val out = new java.util.HashMap[String, Array[Block]](m.size() * 2)
        m.forEach((t, bs) => out.put(t, bs.sortBy(_.firstDocId).toArray))
        Iterator(out)
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_ONLY)
    parts.count() // materialize before first query
    new HotIndex(ix, parts)
  }
}
