package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops._

/** Cluster-partitioned NSW graph ANN (Nsw.scala): exact at max knobs,
  * recall pinned at production knobs on random AND clustered corpora,
  * deterministic adjacency, save/load identity. */
class NswSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-nsw-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def randVec(rnd: scala.util.Random, d: Int): Seq[Float] =
    Seq.fill(d)(rnd.nextGaussian().toFloat)

  /** Gaussian-mixture corpus — the "harder than uniform" distribution:
    * points concentrate near a few directions, so greedy descent has
    * real local optima to escape. */
  private def clustered(rnd: scala.util.Random, n: Int, d: Int, centers: Int) = {
    val cs = Array.fill(centers)(Array.fill(d)(rnd.nextGaussian()))
    (0L until n.toLong).map { i =>
      val c = cs(rnd.nextInt(centers))
      (i, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }
  }

  private def bruteTop(emb: org.apache.spark.sql.DataFrame, q: Seq[Float],
                       k: Int): Seq[Long] = {
    import spark.implicits._
    Ann.bruteTopK(emb, "vec_id", "embedding", q, k, Ann.Cosine)
      .select($"key").as[Long].collect().toSeq
  }

  test("exact mode (nProbe=k, ef>=n) equals brute force, rank for rank") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val emb = (0L until 600L).map(i => (i, randVec(rnd, 16)))
      .toDF("vec_id", "embedding")
    val g = Nsw.build(spark, emb, "vec_id", "embedding",
      Nsw.Params(m = 6, efConstruction = 24, kCenters = 4, iters = 2))
    for (seed <- 1 to 4) {
      val q = randVec(new scala.util.Random(seed), 16)
      val got = Nsw.topK(g, q, 10, nProbe = 4, ef = Int.MaxValue)
        .select($"key").as[Long].collect().toSeq
      assert(got == bruteTop(emb, q, 10), s"query seed $seed")
    }
    g.unpersist()
  }

  test("beam recall@10 on random and clustered corpora; probes trade recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(32)
    val corpora = Seq(
      "random" -> (0L until 2000L).map(i => (i, randVec(rnd, 24))),
      "clustered" -> clustered(rnd, 2000, 24, 8))
    corpora.foreach { case (name, rows) =>
      val emb = rows.toDF("vec_id", "embedding")
      val g = Nsw.build(spark, emb, "vec_id", "embedding",
        Nsw.Params(m = 8, efConstruction = 48, kCenters = 8, iters = 2))
      val queries = (101 to 110).map(s => randVec(new scala.util.Random(s), 24))
      def recall(nProbe: Int, ef: Int): Double = {
        val hits = queries.map { q =>
          val truth = bruteTop(emb, q, 10).toSet
          val got = Nsw.topK(g, q, 10, nProbe, ef)
            .select($"key").as[Long].collect().toSet
          (truth & got).size
        }.sum
        hits.toDouble / (10.0 * queries.size)
      }
      val full = recall(nProbe = 8, ef = 64)
      assert(full >= 0.9, s"$name: beam recall@10 with all probes = $full")
      val partial = recall(nProbe = 2, ef = 64)
      info(f"$name: recall@10 ef=64 nProbe=8 -> $full%.2f, nProbe=2 -> $partial%.2f")
      assert(partial <= full + 1e-9)
      g.unpersist()
    }
  }

  test("adjacency is deterministic across rebuilds") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    val rows = (0L until 500L).map(i => (i, randVec(rnd, 12)))
    // same input layout twice: centroid bits and therefore adjacency must
    // reproduce exactly (cross-parallelism bits vary only via k-means
    // partial-sum order — documented, same contract as the IVF path)
    def checksum(): (Long, String, Seq[(Long, Seq[Long])]) = {
      val emb = spark.createDataset(rows).repartition(3)
        .toDF("vec_id", "embedding")
      val g = Nsw.build(spark, emb, "vec_id", "embedding",
        Nsw.Params(m = 6, efConstruction = 24, kCenters = 4, iters = 2))
      val s = g.adj.select(xxhash64(col("c"), col("key"),
          to_json(col("nbrs"))).as("h"))
        .agg(expr("bit_xor(h)")).as[Long].head()
      val cent = g.centroids.map(_.mkString(",")).mkString(";")
      val dump = g.adj.select(col("key"), col("nbrs"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
      g.unpersist()
      (s, cent, dump)
    }
    val (s1, c1, d1) = checksum()
    val (s2, c2, d2) = checksum()
    assert(c1 == c2, "centroids differ across rebuilds")
    val diff = d1.zip(d2).filter { case (a, b) => a != b }
    assert(diff.isEmpty, s"adjacency differs at ${diff.take(3)}")
    assert(s1 == s2)
  }

  test("save/load round-trip serves identical results") {
    import spark.implicits._
    val rnd = new scala.util.Random(34)
    val emb = clustered(rnd, 800, 16, 4).toDF("vec_id", "embedding")
    val g = Nsw.build(spark, emb, "vec_id", "embedding",
      Nsw.Params(m = 6, efConstruction = 32, kCenters = 4, iters = 2))
    val q = randVec(new scala.util.Random(7), 16)
    val before = Nsw.topK(g, q, 10, nProbe = 4, ef = 48)
      .as[(Long, Double)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-nsw-rt").toString
    Nsw.save(spark, g, dir)
    g.unpersist()
    val loaded = Nsw.load(spark, dir)
    val after = Nsw.topK(loaded, q, 10, nProbe = 4, ef = 48)
      .as[(Long, Double)].collect().toSeq
    assert(before == after)
    // probe filter on the loaded (partitionBy c) layout prunes partitions
    val plan = Nsw.topK(loaded, q, 10, nProbe = 1, ef = 48)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("c#"),
      "expected partition pruning on the cluster column")
  }

  test("fragmented loaded graph reassembles clusters before beam search") {
    import spark.implicits._
    // A load()ed graph's clusters arrive split across scan partitions at
    // production sizes (~128 MB parquet splits). Beam-searching a FRAGMENT
    // silently drops cross-fragment edges -> recall loss. Simulate the
    // worst fragmentation (random row-level split) and require results
    // identical to the in-session cluster-local graph at production knobs.
    val rnd = new scala.util.Random(35)
    val emb = clustered(rnd, 1200, 16, 4).toDF("vec_id", "embedding")
    val g = Nsw.build(spark, emb, "vec_id", "embedding",
      Nsw.Params(m = 6, efConstruction = 32, kCenters = 4, iters = 2))
    val fragmented = g.copy(adj = g.adj.repartition(13), clusterLocal = false)
    for (seed <- 1 to 3) {
      val q = randVec(new scala.util.Random(seed), 16)
      val want = Nsw.topK(g, q, 10, nProbe = 3, ef = 32)
        .as[(Long, Double)].collect().toSeq
      val got = Nsw.topK(fragmented, q, 10, nProbe = 3, ef = 32)
        .as[(Long, Double)].collect().toSeq
      assert(got == want, s"fragmented graph diverged (seed $seed)")
    }
    g.unpersist()
  }
}
