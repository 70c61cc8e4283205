package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._

/** Gate queries for the training-data-pipeline operators (dedup,
  * similarity search, text analysis, multimodal) and the relational /
  * event-stream checklist — each paired with DuckDB oracle SQL in
  * [[GateOpsOracle]]. */
object GateOps {

  // ---------- dedup ----------

  /** documents ∪ exact copies (doc_id+100000) of doc_id < 50. */
  private def augExact(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Gate.documents(spark, sfDir).select(col("doc_id"), col("text"))
    d.union(d.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** documents (doc_id < 1000) ∪ near-copies (doc_id+100000,
    * text + " zz extra") of doc_id % 25 = 0 — constructs known
    * near-duplicates deterministically in BOTH engines (the corpus has no
    * organic dups). The doc_id bound keeps the gate subset fixed-size
    * across scale factors (identical bound in the oracle SQL). */
  private def augNear(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Gate.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 1000)
    d.union(d.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz extra")).as("text")))
  }

  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exactGroups(augExact(spark, sfDir), "doc_id", "text")
      .select(col("text_md5"), col("cnt"), col("min_key").as("min_doc"))
      .orderBy(col("min_doc"))

  def dedupJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val sub = augNear(spark, sfDir).filter(col("doc_id") % 25 === 0)
      .filter(col("doc_id") % 100000 < 500)
    val sh = Dedup.shingles(sub, "doc_id", "text")
    Dedup.jaccardPairs(sh, 0.4)
      .select(col("a"), col("b"), round(col("jacc") * 10000).cast("long").as("jacc_q"))
      .orderBy(col("a"), col("b"))
  }

  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.lshNearDupPairs(augNear(spark, sfDir), "doc_id", "text", threshold = 0.8)
      .select(col("a"), col("b"), round(col("jacc") * 10000).cast("long").as("jacc_q"))
      .orderBy(col("a"), col("b"))

  def dedupEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0)
    Dedup.embedCosinePairs(emb, "vec_id", "embedding", 0.35)
      .select(col("a"), col("b"), round(col("sim") * 10000).cast("long").as("sim_q"))
      .orderBy(col("a"), col("b"))
  }

  // ---------- text analysis ----------

  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.quality(Gate.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def textTokens(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.tokenCounts(Gate.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def textLangId(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.langId(Gate.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def textSimhash(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.simhash(Gate.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.fingerprint(Gate.documents(spark, sfDir), "doc_id", "text").orderBy(col("doc_id"))

  // ---------- similarity search ----------

  private[graft] def queryVec(spark: SparkSession, sfDir: String, id: Long): Seq[Float] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") === id).select(col("embedding"))
      .as[Seq[Float]].head()
  }

  private def ranked(df: DataFrame, asc: Boolean): DataFrame = {
    val w = if (asc) Window.orderBy(col("sim").asc, col("key").asc)
            else Window.orderBy(col("sim").desc, col("key").asc)
    df.withColumn("rank", row_number().over(w))
      .withColumn("sim_q", round(col("sim") * 10000).cast("long"))
      .select(col("key").as("vec_id"), col("rank"), col("sim_q"))
      .orderBy(col("rank"))
  }

  def annCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    ranked(Ann.bruteTopK(emb, "vec_id", "embedding",
      queryVec(spark, sfDir, 0), 10, Ann.Cosine), asc = false)
  }

  def annDot(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    ranked(Ann.bruteTopK(emb, "vec_id", "embedding",
      queryVec(spark, sfDir, 0), 10, Ann.Dot), asc = false)
  }

  def annL2(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    ranked(Ann.bruteTopK(emb, "vec_id", "embedding",
      queryVec(spark, sfDir, 0), 10, Ann.L2), asc = true)
  }

  /** IVF path in exact mode (nProbe == kCenters) so the oracle is the
    * brute-force ranking; nProbe < kCenters is the production scale knob
    * (recall measured in AnnSpec). */
  def annIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val built = Ann.buildIvf(spark, emb, "vec_id", "embedding", kCenters = 8, iters = 2)
    // persistence round-trip ON the gate: the query serves from the saved
    // artifact (cluster-partitioned parquet + centroid JSON), not the
    // session-built assignment — Jackson doubles round-trip bit-exactly,
    // so the oracle hash is unchanged
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ann.saveIvf(spark, built, dir)
    built.assigned.unpersist()
    val ivf = Ann.loadIvf(spark, dir)
    ranked(Ann.ivfTopK(ivf, queryVec(spark, sfDir, 1), 10, nProbe = 8), asc = false)
  }

  /** PQ path in exact mode (rerank set covers the whole gate corpus, like
    * annIvf's nProbe == kCenters) so the oracle is brute-force L2; smaller
    * rerankFactor is the production knob (recall measured in OpsSpec). */
  def annPq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model0 = Pq.train(spark, emb, "vec_id", "embedding", m = 4, iters = 3)
    val codes0 = Pq.encode(spark, emb, "vec_id", "embedding", model0)
    // persistence round-trip ON the gate (see annIvf)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Pq.save(spark, model0, codes0, dir)
    val (model, codes) = Pq.load(spark, dir)
    val nAll = emb.count()
    val res = Pq.topK(spark, codes, emb, "vec_id", "embedding", model,
      queryVec(spark, sfDir, 2), 10,
      rerankFactor = ((nAll + 9) / 10).toInt.max(1))
    ranked(res.select(col("key"), sqrt(col("dist2")).as("sim")), asc = true)
  }

  /** Binary-quantization path in exact mode (rerank set covers the gate
    * corpus, like annPq) so the oracle is brute-force cosine; small
    * rerankFactor is the production knob (recall measured in OpsSpec).
    * Serves through a save -> load round-trip like the other ANN gates. */
  def annBq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model0 = Bq.train(spark, emb, "vec_id", "embedding")
    val codes0 = Bq.encode(spark, emb, "vec_id", "embedding", model0)
    val dir = java.nio.file.Files.createTempDirectory("graft-bq").toString
    Bq.save(spark, model0, codes0, dir)
    val (model, codes) = Bq.load(spark, dir)
    val nAll = emb.count()
    val res = Bq.topK(spark, codes, emb, "vec_id", "embedding", model,
      queryVec(spark, sfDir, 4), 10,
      rerankFactor = ((nAll + 9) / 10).toInt.max(1))
    ranked(res, asc = false)
  }

  /** LVQ path in exact mode (rerank covers the gate corpus, like annBq) so
    * the oracle is brute-force cosine; small rerankFactor is the
    * production knob (recall + BQ-dominance pinned in OpsSpec). Serves
    * through a save -> load round-trip like the other ANN gates. */
  def annLvq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model0 = Lvq.train(spark, emb, "vec_id", "embedding")
    val codes0 = Lvq.encode(spark, emb, "vec_id", "embedding", model0)
    val dir = java.nio.file.Files.createTempDirectory("graft-lvq").toString
    Lvq.save(spark, model0, codes0, dir)
    val (model, codes) = Lvq.load(spark, dir)
    val nAll = emb.count()
    val res = Lvq.topK(spark, codes, emb, "vec_id", "embedding", model,
      queryVec(spark, sfDir, 5), 10,
      rerankFactor = ((nAll + 9) / 10).toInt.max(1))
    ranked(res, asc = false)
  }

  /** Graph path (cluster-partitioned NSW, Nsw.scala) in exact mode —
    * nProbe == kCenters and ef >= cluster size, so the beam frontier
    * admits every node and the oracle is brute-force cosine (the same
    * contract as annIvf/annPq); production knobs measured in NswSpec. */
  def annGraph(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val built = Nsw.build(spark, emb, "vec_id", "embedding",
      Nsw.Params(m = 8, efConstruction = 32, kCenters = 8, iters = 2))
    // persistence round-trip ON the gate (see annIvf)
    val dir = java.nio.file.Files.createTempDirectory("graft-nsw").toString
    Nsw.save(spark, built, dir)
    built.unpersist()
    val g = Nsw.load(spark, dir)
    ranked(Nsw.topK(g, queryVec(spark, sfDir, 3), 10,
      nProbe = g.params.kCenters, ef = Int.MaxValue), asc = false)
  }

  /** Vector threshold (range) search in exact mode — nProbe == kCenters
    * and maxVisit >= cluster size, so the flood degenerates to the exact
    * scan and the oracle is brute-force `sim >= tau` (the same exactness
    * convention as the other ANN gates); production knobs (the tau-level
    * flood) are measured in NswSpec. */
  def annThreshold(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val built = Nsw.build(spark, emb, "vec_id", "embedding",
      Nsw.Params(m = 8, efConstruction = 32, kCenters = 8, iters = 2))
    // persistence round-trip ON the gate (see annIvf/annGraph); also
    // releases the built graph's cache instead of leaking it per call
    val dir = java.nio.file.Files.createTempDirectory("graft-nsw-th").toString
    Nsw.save(spark, built, dir)
    built.unpersist()
    val g = Nsw.load(spark, dir)
    val res = Nsw.threshold(g, queryVec(spark, sfDir, 6), tau = 0.25,
      nProbe = g.params.kCenters, maxVisit = Int.MaxValue)
    res.select(col("key").as("vec_id"),
        round(col("sim") * 10000).cast("long").as("sim_q"))
      .orderBy(col("vec_id"))
  }

  // ---------- multimodal ----------

  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // even doc_id: REAL BMP payload — dimensions derive from the id, so
    // the SQL oracle independently predicts what the actual header parse
    // must return (decode(synthesize(w,h)) == (w,h) end-to-end);
    // odd doc_id: raw text bytes, exercising the documented stub fallback
    val withPay = Gate.documents(spark, sfDir)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        if (id % 2 == 0)
          (id, Multimodal.syntheticBmp((id % 40 + 1).toInt, (id % 25 + 1).toInt, id))
        else (id, text.getBytes("UTF-8"))
      }.toDF("doc_id", "payload")
    Multimodal.extractMeta(withPay, "doc_id")
      .select(col("key").as("doc_id"), col("n_bytes"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        col("frames").cast("long").as("frames"))
      .orderBy(col("doc_id"))
  }

  // ---------- relational checklist (stock Spark, oracle-checked) ----------

  def relQ1(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity"))).cast("long").as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).cast("long").as("rev_q"),
        round(avg(col("l_discount")) * 10000).cast("long").as("avg_disc_q"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  def relJoinTop10(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val agg = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("o_totalprice"))).cast("long").as("rev_q"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("rev_q").desc, col("c_custkey").asc)
    agg.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("rank"), col("c_custkey"), col("c_name"), col("rev_q"), col("n_orders"))
      .orderBy(col("rank"))
  }

  def relWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").filter(col("l_suppkey") < 20)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  def relDistinct(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))

  /** EXCEPT + INTERSECT cardinalities in ONE pass: p_partkey is unique in
    * part, so both set ops reduce to a left join against the distinct
    * probe side + a conditional count — two shuffles total instead of the
    * four that separate except/intersect plans cost (round-1 VERDICT plan
    * audit). Set-op SEMANTICS (incl. distinct) are what the oracle's
    * EXCEPT/INTERSECT compute; `p.except(l)`/`p.intersect(l)` remain
    * available as stock Spark operators. */
  def relSetops(spark: SparkSession, sfDir: String): DataFrame = {
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey")).distinct()
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").as("p_partkey")).distinct()
      .withColumn("referenced", lit(1))
    p.join(l, Seq("p_partkey"), "left_outer")
      .agg(sum(when(col("referenced").isNull, 1).otherwise(0)).cast("long")
        .as("n_unreferenced"),
        sum(when(col("referenced").isNotNull, 1).otherwise(0)).cast("long")
          .as("n_referenced"))
  }

  // ---------- event streams (batch equivalents; streaming in tests) ----------

  def eventsHourly(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")) * 100).cast("long").as("sum_value_q"))
      .select(unix_timestamp(col("h")).as("h_epoch"), col("event_type"), col("cnt"), col("sum_value_q"))
      .orderBy(col("h_epoch"), col("event_type"))

  def eventsSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("newSession",
        when(col("prev").isNull
          .or(unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800), 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("newSession")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }
}
