package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Graph-based ANN: cluster-partitioned navigable-small-world graphs —
  * the Spark-first counterpart of the reference's core data structure
  * (jvector graph/GraphIndexBuilder.java:154-210 insert-and-prune,
  * graph/GraphSearcher.java:245-306 best-first beam search).
  *
  * A monolithic in-memory proximity graph cannot shard: beam search
  * chases edges anywhere in the corpus, so a 10^12-vector graph would
  * need every executor to see every vector. The distributed re-expression
  * keeps the reference's search *shape* (greedy beam over a bounded-degree
  * graph) but bounds it to units an executor can hold:
  *
  *  - PARTITION by coarse k-means cluster (the IVF layer this repo
  *    already has — `Ann.kmeansCentroids`): each cluster's vectors land in
  *    one task, sized by `kCenters` (10^12 vectors / 10^6 centers ≈ 10^6
  *    nodes ≈ 0.5 GB per graph — an executor-resident unit).
  *  - BUILD one NSW graph per cluster inside `mapPartitions` (no driver
  *    state, no cross-cluster edges): insert nodes in key order; each new
  *    node beam-searches the partial graph (efConstruction frontier) and
  *    links bidirectionally to its `m` nearest; neighbor lists prune to
  *    2m closest when they overflow (GraphIndexBuilder.java's
  *    insert/backlink/prune cycle, minus levels — the cluster layer
  *    replaces HNSW's upper levels as the coarse router).
  *  - SEARCH probes the `nProbe` nearest clusters only (centroid ranking
  *    on the driver, file-level partition pruning on a loaded graph) and
  *    runs the reference-style best-first beam (`ef` frontier) inside
  *    each probed cluster; global top-k is a tiny sorted merge of
  *    nProbe·k candidates.
  *
  * Exactness/recall contract (mirrors `Ann.ivfTopK`'s nProbe == kCenters
  * and `Pq.topK`'s full-rerank gate modes): at nProbe == kCenters and
  * ef >= cluster size the frontier admits every node and the search
  * degenerates to the exact scan — that is the gate configuration, so the
  * DuckDB oracle is brute force. Production knobs (nProbe < kCenters,
  * ef ~ 4k) trade recall for work; NswSpec pins recall@10 on both random
  * and clustered corpora, and the recall-vs-ef curve is recorded in
  * BASELINE.md (tools/recall_graph_r3.json).
  *
  * Determinism: insertion order, beam tie-breaks, and prune tie-breaks
  * all order by (similarity, then smaller node id) — given the centroids,
  * each cluster's adjacency is a pure function of its member set, so
  * rebuilds reproduce bit-identical graphs. (The centroids themselves
  * inherit `Ann.kmeansCentroids`' contract: the training SAMPLE is
  * partitioning-independent, but partial-sum addition order follows the
  * input partitioning, so exact centroid bits are reproducible for a
  * given input layout — same as the IVF path.)
  */
object Nsw {

  /** On-disk format of a saved graph (meta.json + adj parquet). */
  val FormatVersion = 1L

  /** @param m             edges added per insert (degree cap = 2m)
    * @param efConstruction beam width while building
    * @param kCenters      coarse clusters = graph partitions
    * @param iters         Lloyd rounds for the coarse centroids */
  final case class Params(m: Int = 8, efConstruction: Int = 48,
                          kCenters: Int = 8, iters: Int = 2)

  /** adj rows: (c: Int, key: Long, v: Array[Double], nbrs: Array[Long]) —
    * neighbor lists carry KEYS (stable across save/load re-partitioning;
    * search rebuilds the key -> index map per cluster).
    *
    * @param clusterLocal whether every cluster's rows are physically
    *   co-located in one Spark partition. True for in-session builds
    *   (build() repartitions by `c` and persists that layout); FALSE for a
    *   load()ed graph — spark.read splits a big cluster's parquet across
    *   scan partitions (~128 MB splits), and beam-searching a FRAGMENT
    *   silently drops cross-fragment neighbor edges (recall loss). Search
    *   reassembles clusters (one narrow-ish shuffle of only the probed
    *   clusters' rows) whenever this is false. */
  final case class Graph(adj: DataFrame, centroids: Array[Array[Double]],
                         params: Params, clusterLocal: Boolean = true) {
    def unpersist(): Unit = adj.unpersist()
  }

  /** Scalar cosine kernel — same accumulation order as the codegen
    * CosineSim expression (VectorExprs.scala:95-103), so beam scores are
    * bit-identical to the brute-force scan's. */
  private[ops] def cosineSim(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Best-first beam search over nodes [0, n) (GraphSearcher.java:245-306
    * re-expressed): returns up to `ef` (idx, sim) sorted by
    * (sim desc, idx asc). ef >= n degenerates to the exact scan (the
    * frontier admits every node) — the gate's exact mode. */
  private[ops] def beamSearch(q: Array[Double], vecs: Array[Array[Double]],
                              adj: Array[Array[Int]], n: Int, entry: Int,
                              ef: Int): Array[(Int, Double)] = {
    if (n <= 0) return Array.empty
    if (ef >= n) {
      val all = Array.tabulate(n)(i => (i, cosineSim(q, vecs(i))))
      java.util.Arrays.sort(all, ResultOrder)
      return all
    }
    // max-heap: higher sim first, tie -> smaller idx first
    val candOrd = new Ordering[(Double, Int)] {
      def compare(a: (Double, Int), b: (Double, Int)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else Integer.compare(b._2, a._2)
      }
    }
    // dequeues the WORST kept result (lowest sim, tie -> larger idx)
    val worstOrd = new Ordering[(Double, Int)] {
      def compare(a: (Double, Int), b: (Double, Int)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else Integer.compare(a._2, b._2)
      }
    }
    val cand = mutable.PriorityQueue.empty[(Double, Int)](candOrd)
    val res = mutable.PriorityQueue.empty[(Double, Int)](worstOrd)
    val visited = new java.util.BitSet(n)
    val es = cosineSim(q, vecs(entry))
    visited.set(entry)
    cand.enqueue((es, entry))
    res.enqueue((es, entry))
    while (cand.nonEmpty) {
      val (cs, ci) = cand.dequeue()
      if (res.size >= ef && cs < res.head._1) {
        cand.clear() // frontier can't beat the kept set: terminate
      } else {
        val nbrs = adj(ci)
        var j = 0
        while (j < nbrs.length) {
          val nb = nbrs(j)
          if (nb < n && !visited.get(nb)) {
            visited.set(nb)
            val s = cosineSim(q, vecs(nb))
            if (res.size < ef || s > res.head._1) {
              cand.enqueue((s, nb))
              res.enqueue((s, nb))
              if (res.size > ef) res.dequeue()
            }
          }
          j += 1
        }
      }
    }
    val out = res.dequeueAll.toArray.map(p => (p._2, p._1))
    java.util.Arrays.sort(out, ResultOrder)
    out
  }

  private val ResultOrder = new java.util.Comparator[(Int, Double)] {
    def compare(a: (Int, Double), b: (Int, Double)): Int = {
      val c = java.lang.Double.compare(b._2, a._2)
      if (c != 0) c else Integer.compare(a._1, b._1)
    }
  }

  /** Diverse neighbor selection (the reference's occlusion prune,
    * graph/GraphIndexBuilder.java retained-diversity heuristic; same rule
    * as HNSW's SELECT-NEIGHBORS-HEURISTIC): walking candidates best-first,
    * a candidate is kept unless it is closer to an already-kept neighbor
    * than to the base node — occluded edges add no reachability, and in a
    * tight cluster closest-M pruning makes every list point at the same
    * hub set, stranding perimeter nodes (measured: clustered-corpus
    * recall@10 0.8 with closest-M vs 1.0 with this rule). Spilled
    * candidates backfill remaining slots (keep-pruned-connections). */
  private def selectDiverse(cands: Array[(Int, Double)], limit: Int,
                            vecs: Array[Array[Double]]): Array[Int] = {
    val kept = new mutable.ArrayBuffer[Int](limit)
    val spill = new mutable.ArrayBuffer[Int]()
    var t = 0
    while (t < cands.length && kept.size < limit) {
      val (c, simToBase) = cands(t)
      var occluded = false
      var k = 0
      while (!occluded && k < kept.size) {
        if (cosineSim(vecs(c), vecs(kept(k))) > simToBase) occluded = true
        k += 1
      }
      if (occluded) spill += c else kept += c
      t += 1
    }
    (kept ++ spill.take(limit - kept.size)).toArray
  }

  /** One cluster's NSW adjacency (insert in index order; callers pass
    * vectors sorted by key so the result depends only on the cluster's
    * membership, not on task scheduling). */
  private[ops] def buildCluster(vecs: Array[Array[Double]],
                                m: Int, efC: Int): Array[Array[Int]] = {
    val n = vecs.length
    val adj = Array.fill(n)(Array.empty[Int])
    val maxDeg = 2 * m
    def prune(j: Int): Unit = if (adj(j).length > maxDeg) {
      val scored = adj(j).map(x => (x, cosineSim(vecs(j), vecs(x))))
      java.util.Arrays.sort(scored, ResultOrder)
      adj(j) = selectDiverse(scored, maxDeg, vecs)
    }
    var i = 1
    while (i < n) {
      val cands = beamSearch(vecs(i), vecs, adj, i, 0, efC)
      val nbrs = selectDiverse(cands, math.min(m, cands.length), vecs)
      var t = 0
      while (t < nbrs.length) {
        val j = nbrs(t)
        adj(i) = adj(i) :+ j
        adj(j) = adj(j) :+ i
        prune(j)
        t += 1
      }
      prune(i)
      i += 1
    }
    adj
  }

  def build(spark: SparkSession, emb: DataFrame, keyCol: String,
            vecCol: String, params: Params = Params()): Graph = {
    import spark.implicits._
    val centroids = Ann.kmeansCentroids(spark, emb, keyCol, vecCol,
      params.kCenters, params.iters)
    val cB = spark.sparkContext.broadcast(centroids)
    val assigned = emb
      .select(col(keyCol).cast("long").as("key"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
      .map { case (k, v) => (Ann.nearestCentroid(v.toArray, cB.value), k, v) }
    // one shuffle keyed by cluster; a task may receive several clusters
    // (hash collisions) and builds each independently
    val m = params.m
    val efC = params.efConstruction
    val adj = assigned.toDF("c", "key", "v")
      .repartition(params.kCenters, col("c"))
      .as[(Int, Long, Seq[Double])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (c, rows) =>
          val sorted = rows.sortBy(_._2)
          val keys = sorted.map(_._2)
          val vecs = sorted.map(_._3.toArray)
          val a = buildCluster(vecs, m, efC)
          keys.indices.iterator.map { i =>
            (c, keys(i), vecs(i).toSeq, a(i).map(keys(_)).toSeq)
          }
        }
      }.toDF("c", "key", "v", "nbrs")
    Graph(adj.persist(), centroids, params)
  }

  /** Probe the nProbe nearest clusters; beam-search each; merge top-k.
    * nProbe == kCenters && ef >= cluster size == exact (gate mode). */
  def topK(graph: Graph, query: Seq[Float], k: Int, nProbe: Int,
           ef: Int): DataFrame = {
    val spark = graph.adj.sparkSession
    import spark.implicits._
    val q = query.map(_.toDouble).toArray
    val probes = graph.centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < q.length) { val t = q(j) - c(j); d += t * t; j += 1 }
      (i, d)
    }.sortBy(_._2).take(nProbe).map(_._1).toSeq
    val qB = spark.sparkContext.broadcast(q)
    val kk = k
    val efq = ef
    val probed0 = graph.adj.filter(col("c").isin(probes: _*))
    // a loaded graph's clusters may be split across scan partitions:
    // reassemble each probed cluster into one partition so beamSearch sees
    // the WHOLE adjacency (the probe filter pushes below this exchange, so
    // partition-dir pruning still applies and only probed rows shuffle)
    val probed = if (graph.clusterLocal) probed0
                 else probed0.repartition(math.max(1, probes.size), col("c"))
    probed
      .as[(Int, Long, Seq[Double], Seq[Long])]
      .mapPartitions { it =>
        it.toArray.groupBy(_._1).iterator.flatMap { case (_, rows) =>
          val sorted = rows.sortBy(_._2)
          val keys = sorted.map(_._2)
          val idxOf = keys.zipWithIndex.toMap
          val vecs = sorted.map(_._3.toArray)
          val adj = sorted.map(_._4.toArray.flatMap(idxOf.get))
          beamSearch(qB.value, vecs, adj, vecs.length, 0, efq)
            .take(kk).iterator.map { case (i, s) => (keys(i), s) }
        }
      }.toDF("key", "sim")
      .orderBy(col("sim").desc, col("key").asc)
      .limit(k)
  }

  /** Persist: centroid/param meta as format-versioned JSON, adjacency
    * parquet PARTITIONED BY cluster — a loaded graph's probe filter
    * prunes whole partition directories at the file level (same layout
    * contract as Ann.saveIvf). */
  def save(spark: SparkSession, graph: Graph, dir: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("formatVersion", FormatVersion)
    root.put("m", graph.params.m)
    root.put("efConstruction", graph.params.efConstruction)
    root.set("centroids", mapper.valueToTree(graph.centroids)
      : com.fasterxml.jackson.databind.JsonNode)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.meta.json.tmp")
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val out = fs.create(tmp, true)
    out.write(mapper.writeValueAsBytes(root)); out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      require(fs.rename(tmp, p), s"graph meta publish failed at $p")
    }
    graph.adj.write.mode("overwrite").partitionBy("c").parquet(s"$dir/adj")
  }

  def load(spark: SparkSession, dir: String): Graph = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$dir/meta.json"))
    val json = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    val mNode = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val v = if (mNode.has("formatVersion")) mNode.get("formatVersion").asLong() else 0L
    require(v <= FormatVersion, s"unsupported NSW graph format v$v")
    val cn = mNode.get("centroids")
    val centroids = Array.tabulate(cn.size()) { c =>
      val cent = cn.get(c)
      Array.tabulate(cent.size())(cent.get(_).asDouble())
    }
    val params = Params(m = mNode.get("m").asInt(),
      efConstruction = mNode.get("efConstruction").asInt(),
      kCenters = centroids.length)
    val adj = spark.read.parquet(s"$dir/adj")
      .select(col("c").cast("int").as("c"), col("key"), col("v"), col("nbrs"))
    // clusterLocal = false: the scan's split planning knows nothing about
    // cluster boundaries — search must reassemble probed clusters
    Graph(adj, centroids, params, clusterLocal = false)
  }
}
