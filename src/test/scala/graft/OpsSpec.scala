package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops._

/** Spark-level tests for dedup / ANN / multimodal operators, including
  * the approximate paths the oracle gate can't cover (LSH recall, IVF
  * probe-recall tradeoff, simhash banding). */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ops-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def randText(rnd: scala.util.Random, len: Int): String =
    (0 until len).map(_ => s"w${rnd.nextInt(80)}").mkString(" ")

  test("LSH near-dup: finds every planted near-duplicate, no false positives above threshold") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val docs = (0L until 200L).map(i => (i, randText(rnd, 150 + rnd.nextInt(100))))
    // plant near-dups: copy with a few appended tokens
    val dups = docs.take(30).map { case (i, t) => (i + 1000, t + " qq rr ss") }
    val all = (docs ++ dups).toDF("doc_id", "text")
    val got = Dedup.lshNearDupPairs(all, "doc_id", "text", threshold = 0.8)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val wantPlanted = docs.take(30).map { case (i, _) => (i, i + 1000) }.toSet
    assert(wantPlanted.subsetOf(got), s"missed ${wantPlanted -- got}")
    // verification step guarantees precision: every returned pair really
    // has exact shingle-jaccard >= 0.8
    val sh = Dedup.shingles(all, "doc_id", "text")
    val exact = Dedup.jaccardPairs(sh, 0.8).select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact))
  }

  test("simhash near-dup banding finds planted near-dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(22)
    val docs = (0L until 150L).map(i => (i, randText(rnd, 200)))
    val dups = docs.take(20).map { case (i, t) => (i + 1000, t + " zz") }
    val all = (docs ++ dups).toDF("doc_id", "text")
    val got = TextOps.simhashNearDups(all, "doc_id", "text", maxDist = 6)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val want = docs.take(20).map { case (i, _) => (i, i + 1000) }.toSet
    assert(want.subsetOf(got), s"missed ${want -- got}")
  }

  test("IVF: exact at nProbe=k, recall reported at nProbe<k") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // clustered vectors: 8 centers, points near them
    val emb = (0L until 400L).map { i =>
      val c = (i % 8).toInt
      val v = Array.tabulate(16)(d => (if (d % 8 == c % 8) 5f else 0f) + rnd.nextFloat() * 0.5f)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 3).select($"embedding")
      .as[Seq[Float]].head()
    val brute = Ann.bruteTopK(emb, "vec_id", "embedding", q, 10, Ann.Cosine)
      .select($"key").as[Long].collect().toSeq
    val ivf = Ann.buildIvf(spark, emb, "vec_id", "embedding", kCenters = 8, iters = 3)
    val exact = Ann.ivfTopK(ivf, q, 10, nProbe = 8).select($"key").as[Long].collect().toSeq
    assert(exact == brute, "nProbe == kCenters must equal brute force")
    val probed = Ann.ivfTopK(ivf, q, 10, nProbe = 2).select($"key").as[Long].collect().toSeq
    val recall = probed.toSet.intersect(brute.toSet).size / 10.0
    assert(recall >= 0.8, s"recall@nProbe=2 was $recall") // clustered data: high recall
  }

  test("PQ: 32x-compressed codes + ADC + exact rerank reach high recall; full rerank exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val emb = (0L until 600L).map { i =>
      val c = (i % 6).toInt
      val v = Array.tabulate(16)(d => (if (d == 2 * c || d == 2 * c + 1) 4f else 0f)
        + rnd.nextFloat())
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 7).select($"embedding").as[Seq[Float]].head()
    val brute = Ann.bruteTopK(emb, "vec_id", "embedding", q, 10, Ann.L2)
      .select($"key").as[Long].collect().toSeq
    val model = Pq.train(spark, emb, "vec_id", "embedding", m = 4, iters = 5)
    val codes = Pq.encode(spark, emb, "vec_id", "embedding", model).persist()
    assert(codes.select($"code").as[Array[Byte]].head().length == 4) // 16 floats -> 4 bytes
    // production mode: modest rerank budget, high recall on clustered data
    val approx = Pq.topK(spark, codes, emb, "vec_id", "embedding", model, q, 10,
      rerankFactor = 4).select($"key").as[Long].collect().toSeq
    val recall = approx.toSet.intersect(brute.toSet).size / 10.0
    assert(recall >= 0.8, s"PQ recall@rerank4 was $recall")
    // exact mode: rerank set covers the corpus -> identical to brute force
    val exact = Pq.topK(spark, codes, emb, "vec_id", "embedding", model, q, 10,
      rerankFactor = 60).select($"key").as[Long].collect().toSeq
    assert(exact == brute, "full-rerank PQ must equal brute force")
  }

  test("plan guard: no shipped vector operator plans an interpreted HOF kernel") {
    import spark.implicits._
    // aggregate()/zip_with() over vector columns eval interpreted per
    // element (~µs/row vs ~ns for the codegen kernels) — the expression
    // family behind the round-3 dedup_embed 53x blowup and the round-4
    // Pq.topK rerank finding. Guard every shipped vector operator's plan.
    val rnd = new scala.util.Random(77)
    val emb = (0L until 200L).map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0).select($"embedding").as[Seq[Float]].head()
    val pqModel = Pq.train(spark, emb, "vec_id", "embedding", m = 4, iters = 2)
    val pqCodes = Pq.encode(spark, emb, "vec_id", "embedding", pqModel)
    val bqModel = Bq.train(spark, emb, "vec_id", "embedding")
    val bqCodes = Bq.encode(spark, emb, "vec_id", "embedding", bqModel)
    val lvqModel = Lvq.train(spark, emb, "vec_id", "embedding")
    val lvqCodes = Lvq.encode(spark, emb, "vec_id", "embedding", lvqModel)
    val plans = Seq(
      "ann_brute" -> Ann.bruteTopK(emb, "vec_id", "embedding", q, 5, Ann.Cosine),
      "pq_topk" -> Pq.topK(spark, pqCodes, emb, "vec_id", "embedding", pqModel, q, 5),
      "pq_topk_dot" -> Pq.topKDot(spark, pqCodes, emb, "vec_id", "embedding", pqModel, q, 5),
      "bq_topk" -> Bq.topK(spark, bqCodes, emb, "vec_id", "embedding", bqModel, q, 5),
      "lvq_topk" -> Lvq.topK(spark, lvqCodes, emb, "vec_id", "embedding", lvqModel, q, 5),
      "lvq_topk_dot" -> Lvq.topKDot(spark, lvqCodes, emb, "vec_id", "embedding", lvqModel, q, 5),
      "dedup_embed" -> Dedup.embedCosinePairs(emb, "vec_id", "embedding", 0.9))
    plans.foreach { case (name, df) =>
      val p = df.queryExecution.analyzed.toString
      assert(!p.contains("zip_with"),
        s"$name plans an interpreted zip_with over vectors:\n${p.take(800)}")
      // the HOF prints lowercase "aggregate(" (logical Aggregate nodes and
      // HashAggregate print with a capital A — not matched)
      assert("(^|[^A-Za-z])aggregate\\(".r.findFirstIn(p).isEmpty,
        s"$name plans an interpreted aggregate() over vectors:\n${p.take(800)}")
    }
    plans.collectFirst { case ("dedup_embed", df) => df.unpersist() }
  }

  test("BQ: 1 bit/dim hamming prefilter + exact rerank; exact at full rerank; round-trips") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val emb = (0L until 800L).map { i =>
      val c = (i % 8).toInt
      val v = Array.tabulate(64)(d => (if (d % 8 == c) 3f else 0f) + rnd.nextFloat())
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 11).select($"embedding").as[Seq[Float]].head()
    val brute = Ann.bruteTopK(emb, "vec_id", "embedding", q, 10, Ann.Cosine)
      .select($"key").as[Long].collect().toSeq
    val model = Bq.train(spark, emb, "vec_id", "embedding")
    val codes = Bq.encode(spark, emb, "vec_id", "embedding", model).persist()
    // 64 dims -> exactly one packed long
    assert(codes.select($"bits").as[Array[Long]].head().length == 1)
    // production knob: hamming prefilter at modest rerank, high recall
    val approx = Bq.topK(spark, codes, emb, "vec_id", "embedding", model, q, 10,
      rerankFactor = 8).select($"key").as[Long].collect().toSeq
    val recall = approx.toSet.intersect(brute.toSet).size / 10.0
    assert(recall >= 0.7, s"BQ recall@rerank8 was $recall")
    // exact mode: rerank covers the corpus -> identical to brute force
    val exact = Bq.topK(spark, codes, emb, "vec_id", "embedding", model, q, 10,
      rerankFactor = 80).as[(Long, Double)].collect().toSeq
    assert(exact.map(_._1) == brute, "full-rerank BQ must equal brute force")
    // hamming kernel properties
    assert(model.sim(Array(0L), Array(0L)) == 1.0)
    assert(model.hamming(Array(-1L), Array(0L)) == 64)
    // save -> load round-trip serves identically (bq.json commit marker)
    val dir = java.nio.file.Files.createTempDirectory("graft-bq-rt").toString
    Bq.save(spark, model, codes, dir)
    val (lm, lc) = Bq.load(spark, dir)
    assert(lm.center.toSeq == model.center.toSeq)
    assert(Bq.topK(spark, lc, emb, "vec_id", "embedding", lm, q, 10, rerankFactor = 80)
      .as[(Long, Double)].collect().toSeq == exact)
    codes.unpersist()
  }

  test("LVQ: 4x per-vector uint8 codes — near-lossless recall, dominates BQ, round-trips") {
    import spark.implicits._
    // hard corpus (the aniso test's shape): overlapping unit-normalized
    // Gaussian clusters + outliers — the regime where corpus-level
    // quantization (BQ's single centroid split) loses and per-vector
    // adaptive ranges keep rank order
    val rnd = new scala.util.Random(51)
    val dim = 32
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val emb = (0L until 2000L).map { i =>
      val v =
        if (i % 5 == 4) Array.fill(dim)(rnd.nextGaussian())
        else {
          val c = centers(rnd.nextInt(centers.length))
          c.map(_ + 0.45 * rnd.nextGaussian())
        }
      (i, unit(v))
    }.toDF("vec_id", "embedding").persist()
    val model = Lvq.train(spark, emb, "vec_id", "embedding")
    val codes = Lvq.encode(spark, emb, "vec_id", "embedding", model).persist()
    // 32 dims -> 32 bytes + (bias, scale): ~4x over float32
    assert(codes.select($"u").as[Array[Byte]].head().length == dim)
    // decode is within half a quantization step per element (near-lossless)
    codes.join(emb, codes("key") === emb("vec_id"))
      .select($"u", $"bias", $"scale", $"embedding")
      .as[(Array[Byte], Float, Float, Seq[Float])].take(50).foreach {
        case (u, bias, scale, v) =>
          val dec = model.decodeOne(u, bias, scale)
          val maxErr = v.indices.map(i => math.abs(dec(i) - v(i))).max
          assert(maxErr <= scale / 2 + 1e-6, s"decode error $maxErr > ${scale / 2}")
      }
    val queries = (701 to 715).map { s =>
      val r = new scala.util.Random(s)
      val c = centers(r.nextInt(centers.length))
      unit(c.map(_ + 0.45 * r.nextGaussian()))
    }
    def recallOf(topk: Seq[Float] => Set[Long]): Double = {
      val hits = queries.map { q =>
        val truth = Ann.bruteTopK(emb, "vec_id", "embedding", q, 10, Ann.Cosine)
          .select($"key").as[Long].collect().toSet
        (truth & topk(q)).size
      }.sum
      hits / (10.0 * queries.size)
    }
    // code-only ranking (rerankFactor=1): membership decided by the codes
    val rLvq = recallOf(q => Lvq.topK(spark, codes, emb, "vec_id", "embedding",
      model, q, 10, rerankFactor = 1).select($"key").as[Long].collect().toSet)
    val bqModel = Bq.train(spark, emb, "vec_id", "embedding")
    val bqCodes = Bq.encode(spark, emb, "vec_id", "embedding", bqModel).persist()
    val rBq = recallOf(q => Bq.topK(spark, bqCodes, emb, "vec_id", "embedding",
      bqModel, q, 10, rerankFactor = 1).select($"key").as[Long].collect().toSet)
    info(f"code-only recall@10: LVQ(uint8/dim) $rLvq%.3f vs BQ(1bit/dim) $rBq%.3f")
    assert(rLvq >= 0.9, f"LVQ near-lossless claim: code-only recall $rLvq%.3f < 0.9")
    assert(rLvq > rBq, "the middle tier must dominate BQ's recall")
    // exact mode: rerank covers the corpus -> identical to brute force
    val q0 = queries.head
    val brute = Ann.bruteTopK(emb, "vec_id", "embedding", q0, 10, Ann.Cosine)
      .select($"key").as[Long].collect().toSeq
    assert(Lvq.topK(spark, codes, emb, "vec_id", "embedding", model, q0, 10,
      rerankFactor = 200).select($"key").as[Long].collect().toSeq == brute)
    // MIPS twin, exact mode
    val bruteDot = Ann.bruteTopK(emb, "vec_id", "embedding", q0, 10, Ann.Dot)
      .select($"key").as[Long].collect().toSeq
    assert(Lvq.topKDot(spark, codes, emb, "vec_id", "embedding", model, q0, 10,
      rerankFactor = 200).select($"key").as[Long].collect().toSeq == bruteDot)
    // save -> load round-trip serves identically (lvq.json commit marker)
    val dir = java.nio.file.Files.createTempDirectory("graft-lvq-rt").toString
    Lvq.save(spark, model, codes, dir)
    val (lm, lc) = Lvq.load(spark, dir)
    assert(lm.center.toSeq == model.center.toSeq)
    assert(Lvq.topK(spark, lc, emb, "vec_id", "embedding", lm, q0, 10, rerankFactor = 4)
      .as[(Long, Double)].collect().toSeq ==
      Lvq.topK(spark, codes, emb, "vec_id", "embedding", model, q0, 10, rerankFactor = 4)
        .as[(Long, Double)].collect().toSeq)
    // constant RESIDUAL (range 0): scale 0, decode reproduces within
    // float32 bias precision (one add per element)
    val cv = model.center.map(_ + 0.3)
    val (cu, cb2, cs2) = model.encodeOne(cv)
    assert(cs2 < 1e-12f, s"near-zero residual range must give ~zero scale, got $cs2")
    val dec = model.decodeOne(cu, cb2, cs2)
    assert(cv.indices.forall(i => math.abs(dec(i) - cv(i)) < 1e-6))
    // a future-versioned artifact must fail loudly, not misparse
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/lvq.json")
    val json = {
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    }
    val out = fs.create(p, true)
    out.write(json.replace("\"formatVersion\":1", "\"formatVersion\":99").getBytes("UTF-8"))
    out.close()
    val e = intercept[IllegalArgumentException](Lvq.load(spark, dir))
    assert(e.getMessage.contains("unsupported"))
    Seq(emb, codes, bqCodes).foreach(_.unpersist())
  }

  test("anisotropic PQ beats plain PQ recall at equal code size on the hard corpus") {
    import spark.implicits._
    // hard corpus (RecallProbe shape): overlapping unit-normalized Gaussian
    // clusters + outliers, so codes must preserve dot products of
    // HIGH-scoring pairs — exactly what the anisotropic loss weights
    val rnd = new scala.util.Random(41)
    val dim = 32
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val emb = (0L until 3000L).map { i =>
      val v =
        if (i % 5 == 4) Array.fill(dim)(rnd.nextGaussian())
        else {
          val c = centers(rnd.nextInt(centers.length))
          c.map(_ + 0.45 * rnd.nextGaussian())
        }
      (i, unit(v))
    }.toDF("vec_id", "embedding").persist()
    // m=8 (8 bytes/vector): the regime where quantization is fine enough
    // for assignment trades to matter — at very coarse codes (m=4 here,
    // residual norms ~ |x|) the anisotropic trade buys nothing; measured
    // curve in AnisoProbe / BASELINE.md round 4
    val model = Pq.train(spark, emb, "vec_id", "embedding", m = 8, iters = 5)
    val plain = Pq.encode(spark, emb, "vec_id", "embedding", model).persist()
    val aniso = Pq.encode(spark, emb, "vec_id", "embedding", model,
      anisotropicThreshold = 0.35).persist()
    // same code size by construction: assignment changed, nothing else
    assert(aniso.select($"code").as[Array[Byte]].head().length == 8)
    val queries = (501 to 520).map { s =>
      val r = new scala.util.Random(s)
      val c = centers(r.nextInt(centers.length))
      unit(c.map(_ + 0.45 * r.nextGaussian()))
    }
    // ADC-ONLY ranking quality (rerankFactor=1: membership is decided
    // entirely by the codes) under the MIPS scoring the anisotropic loss
    // optimizes, vs brute-force dot ranking
    def recall(codes: org.apache.spark.sql.DataFrame): Double = {
      val hits = queries.map { q =>
        val truth = Ann.bruteTopK(emb, "vec_id", "embedding", q, 10, Ann.Dot)
          .select($"key").as[Long].collect().toSet
        val got = Pq.topKDot(spark, codes, emb, "vec_id", "embedding", model,
          q, 10, rerankFactor = 1).select($"key").as[Long].collect().toSet
        (truth & got).size
      }.sum
      hits / (10.0 * queries.size)
    }
    val (rPlain, rAniso) = (recall(plain), recall(aniso))
    info(f"dot-ADC recall@10 at 8 bytes/vector: plain $rPlain%.3f, anisotropic $rAniso%.3f")
    assert(rAniso > rPlain,
      f"anisotropic ($rAniso%.3f) must beat plain ($rPlain%.3f) at equal code size")
    // encode determinism: same inputs -> same codes
    val again = Pq.encode(spark, emb, "vec_id", "embedding", model,
      anisotropicThreshold = 0.35)
    assert(again.as[(Long, Array[Byte])].collect().toMap.view.mapValues(_.toSeq).toMap
      == aniso.as[(Long, Array[Byte])].collect().toMap.view.mapValues(_.toSeq).toMap)
    // CODEBOOK training (the full SCANN loop: anisotropic assignment AND
    // the per-centroid w x w solve) must beat assignment-only-over-plain-
    // Lloyd codebooks — the round-4 ceiling — at the same code size
    val modelT = Pq.trainAnisotropic(spark, emb, "vec_id", "embedding",
      m = 8, threshold = 0.35, iters = 5)
    val anisoT = Pq.encode(spark, emb, "vec_id", "embedding", modelT,
      anisotropicThreshold = 0.35).persist()
    assert(anisoT.select($"code").as[Array[Byte]].head().length == 8)
    def recallWith(m2: Pq.Model, codes: org.apache.spark.sql.DataFrame): Double = {
      val hits = queries.map { q =>
        val truth = Ann.bruteTopK(emb, "vec_id", "embedding", q, 10, Ann.Dot)
          .select($"key").as[Long].collect().toSet
        val got = Pq.topKDot(spark, codes, emb, "vec_id", "embedding", m2,
          q, 10, rerankFactor = 1).select($"key").as[Long].collect().toSet
        (truth & got).size
      }.sum
      hits / (10.0 * queries.size)
    }
    val rTrained = recallWith(modelT, anisoT)
    info(f"dot-ADC recall@10 at 8 bytes: aniso assignment-only $rAniso%.3f, " +
      f"aniso-TRAINED codebooks $rTrained%.3f")
    assert(rTrained > rAniso,
      f"anisotropic codebooks ($rTrained%.3f) must beat assignment-only ($rAniso%.3f)")
    Seq(emb, plain, aniso, anisoT).foreach(_.unpersist())
  }

  test("PQ persistence: save -> load round-trips the model bit-exactly; format gated") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val emb = (0L until 300L).map { i =>
      (i, Array.tabulate(16)(_ => rnd.nextFloat()).toSeq)
    }.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 5).select($"embedding").as[Seq[Float]].head()
    val model = Pq.train(spark, emb, "vec_id", "embedding", m = 4, iters = 3)
    val codes = Pq.encode(spark, emb, "vec_id", "embedding", model)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-persist").toString
    Pq.save(spark, model, codes, dir)
    val (loaded, loadedCodes) = Pq.load(spark, dir)
    // golden: doubles survive the JSON round-trip bit-for-bit
    assert(loaded.m == model.m && loaded.dim == model.dim)
    assert(loaded.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq)
    assert(loadedCodes.as[(Long, Array[Byte])].collect().toMap.view.mapValues(_.toSeq).toMap
      == codes.as[(Long, Array[Byte])].collect().toMap.view.mapValues(_.toSeq).toMap)
    // query from the loaded artifact == query from the trained one
    def res(m: Pq.Model, c: org.apache.spark.sql.DataFrame) =
      Pq.topK(spark, c, emb, "vec_id", "embedding", m, q, 10, rerankFactor = 4)
        .as[(Long, Double)].collect().toSeq
    assert(res(loaded, loadedCodes) == res(model, codes))
    // a future-versioned model must fail loudly, not misparse
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/model.json")
    val json = {
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    }
    val out = fs.create(p, true)
    out.write(json.replace(s""""formatVersion":${Pq.FormatVersion}""",
      """"formatVersion":999""").getBytes("UTF-8")); out.close()
    intercept[IllegalArgumentException] { Pq.loadModel(spark, dir) }
  }

  test("IVF persistence: loaded index answers identically and probes prune partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val emb = (0L until 400L).map { i =>
      val c = (i % 8).toInt
      (i, Array.tabulate(16)(d => (if (d % 8 == c % 8) 5f else 0f) + rnd.nextFloat() * 0.5f).toSeq)
    }.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" === 3).select($"embedding").as[Seq[Float]].head()
    val built = Ann.buildIvf(spark, emb, "vec_id", "embedding", kCenters = 8, iters = 3)
    val want = Ann.ivfTopK(built, q, 10, nProbe = 2).as[(Long, Double)].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-persist").toString
    Ann.saveIvf(spark, built, dir)
    built.assigned.unpersist()
    val loaded = Ann.loadIvf(spark, dir)
    assert(loaded.centroids.flatten.toSeq == built.centroids.flatten.toSeq)
    val probe = Ann.ivfTopK(loaded, q, 10, nProbe = 2)
    assert(probe.as[(Long, Double)].collect().toSeq == want)
    // cluster-partitioned layout: the probe filter reaches the scan as a
    // PARTITION filter, so unprobed cluster dirs are never even listed in
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("c#"),
      s"probe filter not pushed to partition pruning:\n${planStr.take(1500)}")
  }

  test("artifact GC collects crashed ANN saves, spares committed ones") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-art-gc").toString
    val emb = (0L until 200L).map { i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat))
    }.toDF("vec_id", "embedding")
    // committed artifact: payload + published commit marker
    val g = Nsw.build(spark, emb, "vec_id", "embedding",
      Nsw.Params(m = 4, efConstruction = 16, kCenters = 2, iters = 1))
    Nsw.save(spark, g, s"$root/nsw-ok")
    // crashed save: payload written, meta.json never published
    g.adj.write.mode("overwrite").partitionBy("c").parquet(s"$root/nsw-crashed/adj")
    g.unpersist()
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    // age guard: a fresh (in-flight) save is never collected
    assert(graft.index.SegmentCatalog.gcArtifacts(spark, root, graceMs = 3600000L).isEmpty)
    assert(exists(s"$root/nsw-crashed/adj"))
    // past the grace window the metaless payload dies, the committed one lives
    val dead = graft.index.SegmentCatalog.gcArtifacts(spark, root, graceMs = 0L)
    assert(dead.size == 1 && dead.head.contains("nsw-crashed"), dead.toString)
    assert(!exists(s"$root/nsw-crashed/adj"))
    assert(exists(s"$root/nsw-ok/adj") && exists(s"$root/nsw-ok/meta.json"))
    // the committed graph still loads and serves after GC
    val loaded = Nsw.load(spark, s"$root/nsw-ok")
    assert(Nsw.topK(loaded, Seq.fill(8)(1.0f), 5, nProbe = 2, ef = Int.MaxValue)
      .count() == 5)
  }

  test("multimodal: payload plumbing shapes and stub decode determinism") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val meta = Multimodal.extractMeta(Multimodal.withPayload(docs, "text"), "doc_id")
      .orderBy($"key").collect()
    assert(meta(0).getLong(1) == 11L) // n_bytes of "hello world"
    assert(meta(1).getLong(1) == 0L)
    val frames = Multimodal.sampleFrames(
      Multimodal.withPayload(docs, "text"), "doc_id", stride = 4)
      .orderBy($"key").select($"frames").as[Seq[Array[Byte]]].collect()
    assert(frames(0).length == 2) // 11 bytes / stride 4 = 2 frames
    assert(frames(0).head.toSeq == Seq('h'.toByte))
  }

  test("real decode: BMP and WAV headers parse exactly; other payloads hit the stub") {
    // BMP round-trip: decode(synthesize(w, h)) recovers the dimensions
    for ((w, h) <- Seq((1, 1), (3, 5), (17, 25), (640, 480))) {
      val p = Multimodal.syntheticBmp(w, h, seed = w * 1000L + h)
      assert(Multimodal.isBmp(p) && !Multimodal.isWav(p))
      val m = Multimodal.decode(p)
      assert(m.width == w && m.height == h && m.frames == 1,
        s"BMP ${w}x$h decoded as ${m.width}x${m.height}")
      assert(m.n_bytes == 54 + h.toLong * ((3 * w + 3) / 4 * 4))
    }
    // top-down BMP (negative height) decodes to the magnitude
    val td = Multimodal.syntheticBmp(8, 6, 1L)
    td(22) = (-6 & 0xFF).toByte; td(23) = 0xFF.toByte
    td(24) = 0xFF.toByte; td(25) = 0xFF.toByte
    assert(Multimodal.decode(td).height == 6)
    // WAV round-trip: rate/channels/frames recovered from the RIFF walk
    for ((rate, ch, n) <- Seq((8000, 1, 100), (44100, 2, 4410), (16000, 1, 0))) {
      val p = Multimodal.syntheticWav(rate, ch, n, seed = rate)
      assert(Multimodal.isWav(p) && !Multimodal.isBmp(p))
      val m = Multimodal.decode(p)
      assert(m.width == rate && m.height == ch && m.frames == n,
        s"WAV $rate/$ch/$n decoded as ${m.width}/${m.height}/${m.frames}")
    }
    // non-media payloads (and short prefixes of magic) still hit the stub
    for (bytes <- Seq("plain text".getBytes("UTF-8"), "BM".getBytes("UTF-8"),
                      "RIFF".getBytes("UTF-8"), Array.emptyByteArray)) {
      assert(Multimodal.decode(bytes) == Multimodal.decodeStub(bytes))
    }
    // a TEXT payload that merely starts with "BM" and is >= 54 bytes must
    // NOT reach the real parser: BITMAPINFOHEADER shape (size field 40,
    // planes 1, legal bpp, positive dims) gates the dispatch
    val bmText = ("BM" + "the rest of this is ordinary prose padded to be " +
      "comfortably longer than a bitmap header").getBytes("UTF-8")
    assert(!Multimodal.isBmp(bmText))
    assert(Multimodal.decode(bmText) == Multimodal.decodeStub(bmText))
    // corrupt headers (zero/negative width, zero height) reject to stub
    for ((o, v) <- Seq((18, 0), (18, -12), (22, 0))) {
      val bad = Multimodal.syntheticBmp(12, 7, 3L)
      bad(o) = v.toByte; bad(o + 1) = (v >> 8).toByte
      bad(o + 2) = (v >> 16).toByte; bad(o + 3) = (v >> 24).toByte
      assert(!Multimodal.isBmp(bad), s"corrupt header @$o=$v must not dispatch")
      assert(Multimodal.decode(bad) == Multimodal.decodeStub(bad))
    }
    // the distributed extract path uses the real parser
    import spark.implicits._
    val docs = Seq((2L, Multimodal.syntheticBmp(12, 7, 2L)),
                   (3L, "just text".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val meta = Multimodal.extractMeta(docs, "doc_id").orderBy($"key").collect()
    assert(meta(0).getInt(2) == 12 && meta(0).getInt(3) == 7)
    assert(meta(1).getInt(2) == Multimodal.decodeStub("just text".getBytes("UTF-8")).width)
  }

  test("decodeWav terminates on adversarial/corrupt chunk sizes") {
    // chunk size 0xFFFFFFF8 truncated to int is -8: the old walk advanced
    // by ZERO forever (one bad doc pinned an executor task). The fixed
    // walk stops at the first chunk whose declared size doesn't fit.
    val evil = Multimodal.syntheticWav(8000, 1, 10, seed = 5L)
    evil(40) = 0xF8.toByte; evil(41) = 0xFF.toByte
    evil(42) = 0xFF.toByte; evil(43) = 0xFF.toByte // data size = 0xFFFFFFF8
    assert(Multimodal.isWav(evil))
    val m = Multimodal.decode(evil) // must return, not hang/throw
    assert(m.width == 8000 && m.height == 1 && m.frames == 0,
      s"fmt info kept, oversized data chunk dropped: $m")
    // large positive declared size (would overflow int offsets)
    val big = Multimodal.syntheticWav(44100, 2, 4, seed = 6L)
    big(40) = 0xFE.toByte; big(41) = 0xFF.toByte
    big(42) = 0xFF.toByte; big(43) = 0x7F.toByte // data size = 0x7FFFFFFE
    assert(Multimodal.decode(big).frames == 0)
    // a zero-size chunk is valid and must still advance past its header
    val zero = Multimodal.syntheticWav(16000, 1, 0, seed = 7L)
    assert(Multimodal.decode(zero).width == 16000)
    // truncated fmt chunk: walk stops without reading past the payload
    val trunc = java.util.Arrays.copyOf(Multimodal.syntheticWav(8000, 1, 10, 8L), 44)
    trunc(40) = 99.toByte // declared data bytes > remaining 0 bytes
    assert(Multimodal.decode(trunc).frames == 0)
  }

  test("bucketed embed near-dup == brute force; separated clusters prune pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // 6 well-separated direction clusters + planted near-dups inside them
    val emb = (0L until 300L).map { i =>
      val c = (i % 6).toInt
      val v = Array.tabulate(12)(d => (if (d == 2 * c) 10f else 0f) + rnd.nextFloat() * 0.4f)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val threshold = 0.9
    val want = Dedup.embedCosinePairsBrute(emb, "vec_id", "embedding", threshold)
      .select($"a", $"b", round($"sim" * 10000).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val m = new Dedup.EmbedMetrics
    val got = Dedup.embedCosinePairs(emb, "vec_id", "embedding", threshold,
      kCenters = 6, iters = 3, metrics = m)
      .select($"a", $"b", round($"sim" * 10000).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, "bucketed must be value-identical to all-pairs")
    assert(want.nonEmpty, "test corpus should contain qualifying pairs")
    // triangle-inequality pruning engaged: far fewer than k² cluster pairs
    assert(m.clusterPairs < m.clusters * m.clusters,
      s"no pruning: ${m.clusterPairs} of ${m.clusters * m.clusters} cluster pairs joined")
  }

  test("jaccard df-cap: planted corpus-wide hot shingle does not explode the join") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    // every doc shares the same boilerplate prefix (a hot shingle factory);
    // real near-dups additionally share rare content
    val boiler = "common preamble shared by every single document here"
    val docs = (0L until 120L).map(i => (i, boiler + " " + randText(rnd, 60)))
    val dups = docs.take(15).map { case (i, t) => (i + 1000, t + " x1") }
    val all = (docs ++ dups).toDF("doc_id", "text")
    val sh = Dedup.shingles(all, "doc_id", "text").persist()
    val capped = Dedup.jaccardPairs(sh, 0.7, dfCap = 30)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.jaccardPairs(sh, 0.7, dfCap = 0)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped, "cap must not change results here")
    assert(docs.take(15).map { case (i, _) => (i, i + 1000) }.toSet.subsetOf(capped))
    // the hot boilerplate shingles are excluded from the candidate join
    val total = sh.count()
    val rare = Dedup.rareShingles(sh, 30).count()
    assert(rare < total, s"rare=$rare should exclude the shared-boilerplate shingles")
  }

  test("LSH banding recall across the threshold (16 bands x 4 rows)") {
    // property sweep at the Analyze kernel level: sets with exact Jaccard j
    // must collide in >= 1 band with recall 1.0 for j >= 0.85 (many trials)
    val params = graft.core.Analyze.minHashParams(64)
    val rnd = new scala.util.Random(44)
    def bandedCollide(sa: Set[Long], sb: Set[Long]): Boolean = {
      val ha = graft.core.Analyze.minHash(sa, params)
      val hb = graft.core.Analyze.minHash(sb, params)
      (0 until 16).exists(bd => (0 until 4).forall(r => ha(bd * 4 + r) == hb(bd * 4 + r)))
    }
    def mkPair(n: Int, j: Double): (Set[Long], Set[Long]) = {
      // |A|=|B|=n sharing m elements: J = m / (2n - m)  =>  m = 2nj/(1+j)
      val m = math.round(2 * n * j / (1 + j)).toInt
      val shared = Set.fill(m)(rnd.nextLong().abs % (1L << 28))
      val onlyA = Set.fill(n - shared.size)(rnd.nextLong().abs % (1L << 28))
      val onlyB = Set.fill(n - shared.size)(rnd.nextLong().abs % (1L << 28))
      (shared ++ onlyA, shared ++ onlyB)
    }
    Seq(0.85, 0.9, 0.95).foreach { j =>
      val hits = (0 until 60).count { _ => val (a, b) = mkPair(300, j); bandedCollide(a, b) }
      assert(hits == 60, s"recall at j=$j was $hits/60, want 60/60")
    }
    // and far below the threshold the banding is selective (not everything collides)
    val low = (0 until 60).count { _ => val (a, b) = mkPair(300, 0.3); bandedCollide(a, b) }
    assert(low < 15, s"j=0.3 collided $low/60 — banding not selective")
  }

  test("multimodal: featureExtract vectors feed ANN; resize is deterministic and bounded") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, ("doc " + i) * (10 + (i % 5).toInt)))
      .toDF("doc_id", "text")
    val withP = Multimodal.withPayload(docs, "text")
    val emb = Multimodal.featureExtract(withP, "doc_id")
    val v = emb.orderBy($"key").select($"embedding").as[Seq[Float]].head()
    assert(v.length == 16)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-5) // L2-normalized
    // composes with the ANN operator stack
    val q = emb.filter($"key" === 0).select($"embedding").as[Seq[Float]].head()
    val top = Ann.bruteTopK(emb.toDF("vec_id", "embedding"), "vec_id", "embedding",
      q, 3, Ann.Cosine).select($"key").as[Long].collect()
    assert(top.head == 0L) // self is its own nearest neighbor
    val resized = Multimodal.resize(withP, "doc_id", 320, 240)
      .orderBy($"key").select($"payload", $"width", $"height")
      .as[(Array[Byte], Int, Int)].collect()
    val orig = withP.orderBy($"doc_id").select($"payload").as[Array[Byte]].collect()
    resized.zip(orig).foreach { case ((p, w, h), o) =>
      assert(w == 320 && h == 240)
      assert(p.length <= o.length && p.length >= o.length / 4 - 1) // ~quarter area
    }
    // determinism
    val again = Multimodal.resize(withP, "doc_id", 320, 240)
      .orderBy($"key").select($"payload").as[Array[Byte]].collect()
    assert(again.zip(resized).forall { case (a, (b, _, _)) => a.sameElements(b) })
  }

  test("exact dedup groups") {
    import spark.implicits._
    val docs = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(g.length == 1 && g(0).getLong(1) == 3 && g(0).getLong(2) == 1)
  }
}
