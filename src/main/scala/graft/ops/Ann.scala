package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (Array[Float]) — the engine's sibling of the reference's actual domain
  * (jvector top-k vector search, GraphSearcher.java:128-134), expressed
  * Spark-first: brute-force top-k is one codegen'd scan +
  * TakeOrderedAndProject; IVF is k-means bucketing so a query probes only
  * nProbe partitions of the corpus (the scale path: at 10^12 vectors the
  * centroid assignment is the partition key and probing prunes scans).
  *
  * Similarity math follows jvector's VectorSimilarityFunction.java:37-84
  * (DOT, COSINE, EUCLIDEAN), computed in double precision so the SQL
  * oracle matches bit-for-bit after 1e-4 quantization.
  */
object Ann {

  private def vd(c: Column): Column = transform(c, x => x.cast("double"))
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  sealed trait Sim { def col(a: Column, b: Column): Column; def asc: Boolean }
  case object Cosine extends Sim { def col(a: Column, b: Column) = cosine(a, b); val asc = false }
  case object Dot extends Sim { def col(a: Column, b: Column) = dot(a, b); val asc = false }
  case object L2 extends Sim { def col(a: Column, b: Column) = l2(a, b); val asc = true }

  /** Brute-force top-k: exact baseline. One narrow scan; global top-k is
    * Spark's TakeOrderedAndProject (per-partition heaps + tiny merge). */
  def bruteTopK(emb: DataFrame, keyCol: String, vecCol: String,
                query: Seq[Float], k: Int, sim: Sim): DataFrame = {
    val q = typedlit(query.map(_.toDouble))
    val scored = emb.select(col(keyCol).as("key"),
      sim.col(vd(col(vecCol)), q).as("sim"))
    val ordered =
      if (sim.asc) scored.orderBy(col("sim").asc, col("key").asc)
      else scored.orderBy(col("sim").desc, col("key").asc)
    ordered.limit(k)
  }

  /** Deterministic k-means centroids: init = vectors of the k smallest
    * keys, then `iters` Lloyd rounds (groupBy-avg per assignment — each
    * round is one broadcast + one map-side-combined aggregate). */
  def kmeansCentroids(spark: SparkSession, emb: DataFrame, keyCol: String,
                      vecCol: String, kCenters: Int, iters: Int): Array[Array[Double]] = {
    import spark.implicits._
    val e = emb.select(col(keyCol).as("key"), vd(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])].persist()
    var centroids = e.orderBy($"key").limit(kCenters).collect().map(_._2.toArray)
    (0 until iters).foreach { _ =>
      val cB = spark.sparkContext.broadcast(centroids)
      val assigned = e.map { case (_, v) =>
        (nearestCentroid(v.toArray, cB.value), v)
      }
      // per-centroid mean: typed groupByKey fold (kCenters is small; at
      // scale this is a map-side-combinable vector-sum Aggregator)
      val sums = assigned.groupByKey(_._1)
        .mapGroups { (c, it) =>
          var n = 0L
          var acc: Array[Double] = null
          it.foreach { case (_, v) =>
            if (acc == null) acc = new Array[Double](v.length)
            var i = 0
            while (i < v.length) { acc(i) += v(i); i += 1 }
            n += 1
          }
          (c, acc.map(_ / n))
        }.collect()
      val updated = centroids.clone()
      sums.foreach { case (c, mean) => updated(c) = mean }
      centroids = updated
    }
    e.unpersist()
    centroids
  }

  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF index: corpus partitioned by nearest centroid. */
  final case class Ivf(assigned: DataFrame /* (key, c, v) */ ,
                       centroids: Array[Array[Double]])

  def buildIvf(spark: SparkSession, emb: DataFrame, keyCol: String, vecCol: String,
               kCenters: Int, iters: Int = 3): Ivf = {
    import spark.implicits._
    val centroids = kmeansCentroids(spark, emb, keyCol, vecCol, kCenters, iters)
    val cB = spark.sparkContext.broadcast(centroids)
    val assigned = emb.select(col(keyCol).as("key"), vd(col(vecCol)).as("v"))
      .as[(Long, Seq[Double])]
      .map { case (k, v) => (k, nearestCentroid(v.toArray, cB.value), v) }
      .toDF("key", "c", "v")
    Ivf(assigned.persist(), centroids)
  }

  /** IVF search: probe the nProbe nearest clusters only (partition pruning
    * via the cluster filter; with the corpus written partitionBy("c") this
    * is file-level pruning). nProbe == kCenters degrades to exact. */
  def ivfTopK(ivf: Ivf, query: Seq[Float], k: Int, nProbe: Int): DataFrame = {
    val q = query.map(_.toDouble).toArray
    val order = ivf.centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < q.length) { val t = q(j) - c(j); d += t * t; j += 1 }
      (i, d)
    }.sortBy(_._2).take(nProbe).map(_._1)
    val qc = typedlit(q.toSeq)
    ivf.assigned.filter(col("c").isin(order.toSeq: _*))
      .select(col("key"), (dot(col("v"), qc) / (norm(col("v")) * norm(qc))).as("sim"))
      .orderBy(col("sim").desc, col("key").asc)
      .limit(k)
  }
}
