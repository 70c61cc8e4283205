package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Anisotropic-PQ evidence probe (BASELINE.md round 4): dot-ADC
  * recall@10 at equal code size, plain min-residual assignment vs the
  * SCANN-style anisotropic coordinate descent across a threshold sweep,
  * on the hard corpus (overlapping unit-normalized Gaussian clusters +
  * 20% outliers). Reference capability being matched:
  * jvector pq/ProductQuantization.java:233-312 (encodeAnisotropic).
  *
  * Usage: runMain graft.AnisoProbe   (PQ_M env overrides subspace count)
  */
object AnisoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val dim = 32
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val emb = (0L until 3000L).map { i =>
      val v = if (i % 5 == 4) Array.fill(dim)(rnd.nextGaussian())
              else {
                val c = centers(rnd.nextInt(centers.length))
                c.map(_ + 0.45 * rnd.nextGaussian())
              }
      (i, unit(v))
    }.toDF("vec_id", "embedding").persist()
    val mSub = sys.env.getOrElse("PQ_M", "8").toInt
    val model = Pq.train(spark, emb, "vec_id", "embedding", m = mSub, iters = 5)
    val plain = Pq.encode(spark, emb, "vec_id", "embedding", model).persist()
    val queries = (501 to 520).map { s =>
      val r = new scala.util.Random(s)
      val c = centers(r.nextInt(centers.length))
      unit(c.map(_ + 0.45 * r.nextGaussian()))
    }
    def recallW(m2: Pq.Model, codes: org.apache.spark.sql.DataFrame): Double = {
      val hits = queries.map { q =>
        val truth = Ann.bruteTopK(emb, "vec_id", "embedding", q, 10, Ann.Dot)
          .select($"key").as[Long].collect().toSet
        val got = Pq.topKDot(spark, codes, emb, "vec_id", "embedding", m2,
          q, 10, rerankFactor = 1).select($"key").as[Long].collect().toSet
        (truth & got).size
      }.sum
      hits / (10.0 * queries.size)
    }
    def recall(codes: org.apache.spark.sql.DataFrame): Double = recallW(model, codes)
    val pm = plain.as[(Long, Array[Byte])].collect().toMap
    println(f"m=$mSub plain recall: ${recall(plain)}%.3f")
    for (t <- Seq(0.2, 0.35, 0.5, 0.65, 0.8)) {
      val a = Pq.encode(spark, emb, "vec_id", "embedding", model,
        anisotropicThreshold = t).persist()
      val am = a.as[(Long, Array[Byte])].collect().toMap
      val moved = am.count { case (k, c) => !java.util.Arrays.equals(c, pm(k)) }
      println(f"T=$t pcm=${Pq.parallelCostMultiplier(t, dim)}%.2f " +
        f"moved=$moved/3000 recall=${recall(a)}%.3f")
      a.unpersist()
    }
    // round-5: anisotropic codebook TRAINING (the per-centroid solve) on
    // top of the anisotropic assignment — the full SCANN loop
    for (t <- Seq(0.2, 0.35, 0.5); oi <- Seq(2, 4, 8)) {
      val mt = Pq.trainAnisotropic(spark, emb, "vec_id", "embedding",
        m = mSub, threshold = t, iters = 5, outerIters = oi)
      val a = Pq.encode(spark, emb, "vec_id", "embedding", mt,
        anisotropicThreshold = t).persist()
      println(f"TRAINED T=$t outer=$oi recall=${recallW(mt, a)}%.3f")
      a.unpersist()
    }
    spark.stop()
  }
}
