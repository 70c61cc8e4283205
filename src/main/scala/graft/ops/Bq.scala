package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary quantization: 1 bit per dimension around the corpus centroid —
  * the reference's coarsest compressed representation (jvector
  * pq/BinaryQuantization.java:74-93 encode-around-centroid;
  * pq/BQVectors.java:100-106 similarity = 1 − hamming/d), re-expressed
  * Spark-first:
  *
  *  - TRAIN: the centroid of a bounded deterministic key-hash sample
  *    (same sampling contract as `Pq.train` / the reference's 128k cap).
  *  - ENCODE: one narrow map to d/64 packed longs per vector — a 32×
  *    compression over float32 (256× over the double math), the cheapest
  *    possible coarse filter at 10^12 vectors.
  *  - QUERY: the query binarizes the same way; candidate score is
  *    1 − popcount(xor)/d (a handful of XOR+POPCNT per vector — no
  *    floating point at all in the scan); top k·rerankFactor survivors
  *    get the EXACT cosine (two-phase rerank, the Q4 pattern).
  *
  * Exactness contract (same as Pq/Ivf/Nsw gate modes): a rerank set
  * covering the corpus degenerates to the exact scan, so the DuckDB
  * oracle is brute force; small rerankFactor is the production knob
  * (recall pinned in OpsSpec).
  */
object Bq {

  val FormatVersion = 1L

  final case class Model(center: Array[Double]) {
    def dim: Int = center.length
    def words: Int = (dim + 63) / 64

    /** bit i set iff v(i) > center(i), packed little-endian into longs. */
    def encodeOne(v: Array[Double]): Array[Long] = {
      val bits = new Array[Long](words)
      var i = 0
      while (i < dim) {
        if (v(i) > center(i)) bits(i >> 6) |= (1L << (i & 63))
        i += 1
      }
      bits
    }

    def hamming(a: Array[Long], b: Array[Long]): Int = {
      var h = 0
      var w = 0
      while (w < a.length) { h += java.lang.Long.bitCount(a(w) ^ b(w)); w += 1 }
      h
    }

    /** 1 − hamming/d, the reference's BQ similarity (higher = closer). */
    def sim(a: Array[Long], b: Array[Long]): Double =
      1.0 - hamming(a, b).toDouble / dim
  }

  /** Centroid of a deterministic key-hash sample (bounded driver work). */
  def train(spark: SparkSession, emb: DataFrame, keyCol: String, vecCol: String,
            sampleCap: Long = 131072L): Model = {
    import spark.implicits._
    val all = emb.select(col(keyCol).cast("long").as("key"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val n = all.count()
    val frac = math.max(1L, (n + sampleCap - 1) / sampleCap)
    val sample = (if (frac > 1L) all.filter(pmod(xxhash64(col("key")), lit(frac)) === 0)
                  else all).as[(Long, Seq[Double])].collect()
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head._2.length
    val acc = new Array[Double](dim)
    sample.foreach { case (_, v) =>
      var i = 0
      while (i < dim) { acc(i) += v(i); i += 1 }
    }
    Model(acc.map(_ / sample.length))
  }

  /** Encode the corpus: (key, bits: array<long>). Narrow map, no shuffle. */
  def encode(spark: SparkSession, emb: DataFrame, keyCol: String, vecCol: String,
             model: Model): DataFrame = {
    import spark.implicits._
    val mB = spark.sparkContext.broadcast(model)
    emb.select(col(keyCol).cast("long").as("key"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
      .map { case (k, v) => (k, mB.value.encodeOne(v.toArray)) }
      .toDF("key", "bits")
  }

  /** Approximate top-k by hamming over the packed bits (ties -> smaller
    * key), then EXACT cosine rerank of the k·rerankFactor survivors.
    * Returns (key, sim) descending, k rows. rerank covering the corpus
    * degenerates to exact brute force (gate mode). */
  def topK(spark: SparkSession, codes: DataFrame, emb: DataFrame,
           keyCol: String, vecCol: String, model: Model,
           query: Seq[Float], k: Int, rerankFactor: Int = 8): DataFrame = {
    import spark.implicits._
    val q = query.map(_.toDouble).toArray
    val qBits = model.encodeOne(q)
    val mB = spark.sparkContext.broadcast(model)
    val qB = spark.sparkContext.broadcast(qBits)
    val kk = math.max(1, k * rerankFactor)
    val approx = codes.as[(Long, Array[Long])]
      .mapPartitions { it =>
        val heap = new graft.core.DoubleTopK(kk)
        it.foreach { case (key, bits) =>
          heap.offer(mB.value.sim(bits, qB.value), key)
        }
        heap.drain().iterator
      }.toDF("bsim", "key")
      .orderBy($"bsim".desc, $"key".asc).limit(kk)
    val qc = typedlit(q.toSeq)
    approx.join(emb.select(col(keyCol).cast("long").as("key"), col(vecCol)), "key")
      .withColumn("sim", graft.functions.VectorFunctions.cosineSim(
        transform(col(vecCol), x => x.cast("double")), qc))
      .select(col("key"), col("sim"))
      .orderBy(col("sim").desc, col("key").asc)
      .limit(k)
  }

  /** Persist: codes parquet first, bq.json LAST as the atomic commit
    * marker (shared artifact protocol; gcArtifacts collects metaless
    * crashed saves). */
  def save(spark: SparkSession, model: Model, codes: DataFrame, dir: String): Unit = {
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("formatVersion", FormatVersion)
    root.put("kind", "bq")
    root.set("center", mapper.valueToTree(model.center)
      : com.fasterxml.jackson.databind.JsonNode)
    graft.index.SegmentCatalog.publishJson(spark, s"$dir/bq.json",
      mapper.writeValueAsBytes(root))
  }

  def load(spark: SparkSession, dir: String): (Model, DataFrame) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$dir/bq.json"))
    val json = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val v = if (m.has("formatVersion")) m.get("formatVersion").asLong() else 0L
    require(v <= FormatVersion, s"unsupported BQ format v$v")
    val cn = m.get("center")
    val center = Array.tabulate(cn.size())(cn.get(_).asDouble())
    (Model(center),
      spark.read.parquet(s"$dir/codes").select(col("key"), col("bits")))
  }
}
