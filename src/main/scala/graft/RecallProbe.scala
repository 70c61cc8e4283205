package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Ann, Bq, Lvq, Nsw, Pq}

/** Recall-vs-cost curves for the approximate ANN paths on a corpus HARDER
  * than the clustered test fixtures: overlapping Gaussian clusters plus a
  * 20% uniform-outlier fraction, so bucket boundaries actually cut true
  * neighborhoods. Sweeps IVF nProbe and PQ rerankFactor against the
  * brute-force cosine/L2 oracle — the evidence that IVF+PQ cover the
  * reference's sub-linear-search capability (jvector's recall harness,
  * jvector-examples/SiftSmall.java:92-113) with a tunable recall knob,
  * not just on easy data. One JSON line. Results recorded in BASELINE.md.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val dim = 32
    val kClusters = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // hard corpus: cluster centers on the unit sphere, sigma comparable to
    // inter-center distance (overlap), 20% pure-uniform outliers
    val emb = spark.range(n).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L + 13)
      val v =
        if (rnd.nextDouble() < 0.2) Array.fill(dim)(rnd.nextGaussian().toFloat)
        else {
          val c = rnd.nextInt(kClusters)
          val crnd = new scala.util.Random(c * 7919L + 1)
          Array.tabulate(dim)(_ => (crnd.nextGaussian() + 0.9 * rnd.nextGaussian()).toFloat)
        }
      (i, v.toSeq)
    }.toDF("vec_id", "embedding").persist()
    emb.count()

    val queryIds = (0 until 20).map(_ * 97L)
    val queries = emb.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap

    def recall(got: Seq[Long], want: Seq[Long]): Double =
      got.toSet.intersect(want.toSet).size.toDouble / want.size

    // IVF sweep (cosine)
    val ivf = Ann.buildIvf(spark, emb, "vec_id", "embedding", kClusters, iters = 4)
    val bruteCos = queryIds.map { qid =>
      qid -> Ann.bruteTopK(emb, "vec_id", "embedding", queries(qid), 10, Ann.Cosine)
        .select($"key").as[Long].collect().toSeq
    }.toMap
    val ivfCurve = Seq(1, 2, 4, 8, 16, 32, 64).map { nProbe =>
      val r = queryIds.map { qid =>
        recall(Ann.ivfTopK(ivf, queries(qid), 10, nProbe)
          .select($"key").as[Long].collect().toSeq, bruteCos(qid))
      }.sum / queryIds.size
      nProbe -> r
    }

    // PQ sweep (L2): m=8 -> 16x compression at dim 32 float32
    val model = Pq.train(spark, emb, "vec_id", "embedding", m = 8, iters = 5)
    val codes = Pq.encode(spark, emb, "vec_id", "embedding", model).persist()
    codes.count()
    val bruteL2 = queryIds.map { qid =>
      qid -> Ann.bruteTopK(emb, "vec_id", "embedding", queries(qid), 10, Ann.L2)
        .select($"key").as[Long].collect().toSeq
    }.toMap
    val pqCurve = Seq(1, 2, 4, 8, 16).map { rf =>
      val r = queryIds.map { qid =>
        recall(Pq.topK(spark, codes, emb, "vec_id", "embedding", model,
          queries(qid), 10, rerankFactor = rf)
          .select($"key").as[Long].collect().toSeq, bruteL2(qid))
      }.sum / queryIds.size
      rf -> r
    }

    // NSW graph sweep (cosine): same coarse cluster count as IVF, so the
    // nProbe curves are directly comparable (router identical in shape;
    // within-cluster beam replaces within-cluster scan)
    val g = Nsw.build(spark, emb, "vec_id", "embedding",
      Nsw.Params(m = 8, efConstruction = 64, kCenters = kClusters, iters = 4))
    g.adj.count()
    val nswEfCurve = Seq(8, 16, 32, 64, 128).map { ef =>
      val r = queryIds.map { qid =>
        recall(Nsw.topK(g, queries(qid), 10, nProbe = 8, ef = ef)
          .select($"key").as[Long].collect().toSeq, bruteCos(qid))
      }.sum / queryIds.size
      ef -> r
    }
    val nswProbeCurve = Seq(1, 2, 4, 8, 16, 32, 64).map { nProbe =>
      val r = queryIds.map { qid =>
        recall(Nsw.topK(g, queries(qid), 10, nProbe, ef = 64)
          .select($"key").as[Long].collect().toSeq, bruteCos(qid))
      }.sum / queryIds.size
      nProbe -> r
    }

    // Compression-tier sweep at equal rerank budgets (round 5): LVQ
    // (1 byte/dim, per-vector adaptive) vs BQ (1 bit/dim) vs PQ-as-cosine
    // is covered by OpsSpec; here the recall-vs-rerank curve for the two
    // flat tiers against brute cosine, plus the LVQ-fused graph beam
    val lvqModel = Lvq.train(spark, emb, "vec_id", "embedding")
    val lvqCodes = Lvq.encode(spark, emb, "vec_id", "embedding", lvqModel).persist()
    lvqCodes.count()
    val lvqCurve = Seq(1, 2, 4).map { rf =>
      val r = queryIds.map { qid =>
        recall(Lvq.topK(spark, lvqCodes, emb, "vec_id", "embedding", lvqModel,
          queries(qid), 10, rerankFactor = rf)
          .select($"key").as[Long].collect().toSeq, bruteCos(qid))
      }.sum / queryIds.size
      rf -> r
    }
    val bqModel = Bq.train(spark, emb, "vec_id", "embedding")
    val bqCodes = Bq.encode(spark, emb, "vec_id", "embedding", bqModel).persist()
    bqCodes.count()
    val bqCurve = Seq(1, 2, 4, 8, 16).map { rf =>
      val r = queryIds.map { qid =>
        recall(Bq.topK(spark, bqCodes, emb, "vec_id", "embedding", bqModel,
          queries(qid), 10, rerankFactor = rf)
          .select($"key").as[Long].collect().toSeq, bruteCos(qid))
      }.sum / queryIds.size
      rf -> r
    }
    val gLvq = Nsw.attachLvq(spark, g)
    val lvqFusedCurve = Seq(16, 32, 64).map { ef =>
      val r = queryIds.map { qid =>
        recall(Nsw.topKFusedLvq(gLvq, queries(qid), 10, nProbe = 8, ef = ef)
          .select($"key").as[Long].collect().toSeq, bruteCos(qid))
      }.sum / queryIds.size
      ef -> r
    }

    val ij = ivfCurve.map { case (p, r) => f""""$p":$r%.3f""" }.mkString("{", ",", "}")
    val pj = pqCurve.map { case (p, r) => f""""$p":$r%.3f""" }.mkString("{", ",", "}")
    val nej = nswEfCurve.map { case (p, r) => f""""$p":$r%.3f""" }.mkString("{", ",", "}")
    val npj = nswProbeCurve.map { case (p, r) => f""""$p":$r%.3f""" }.mkString("{", ",", "}")
    val lj = lvqCurve.map { case (p, r) => f""""$p":$r%.3f""" }.mkString("{", ",", "}")
    val bj = bqCurve.map { case (p, r) => f""""$p":$r%.3f""" }.mkString("{", ",", "}")
    val lfj = lvqFusedCurve.map { case (p, r) => f""""$p":$r%.3f""" }.mkString("{", ",", "}")
    println(s"""{"docs":$n,"dim":$dim,"clusters":$kClusters,"outlier_frac":0.2,""" +
      s""""ivf_recall_at_nprobe":$ij,"pq_recall_at_rerank":$pj,""" +
      s""""nsw_recall_at_ef_nprobe8":$nej,"nsw_recall_at_nprobe_ef64":$npj,""" +
      s""""lvq_recall_at_rerank":$lj,"bq_recall_at_rerank":$bj,""" +
      s""""nsw_lvqfused_recall_at_ef_nprobe8":$lfj}""")
    spark.stop()
  }
}
