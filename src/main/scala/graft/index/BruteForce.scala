package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Brute-force BM25 in pure declarative DataFrame ops — the engine's
  * exact-scoring oracle (role of jvector's ExactScoreFunction / full-recall
  * baseline, graph/similarity/SearchScoreProvider.java:20-41). Entirely
  * Catalyst: explode/groupBy/join/window all whole-stage codegen'd; used
  * by tests to assert the WAND path is rank-identical, and by the driver
  * gate to cross-check against DuckDB.
  *
  * Tokenization here MUST stay in lock-step with core.Text.tokenize:
  * lower + split [^a-z0-9]+ + drop empties.
  */
object BruteForce {

  /** (docKey, term) token pairs. */
  def tokens(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol).as("docKey"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")

  /** Top-k BM25 per query over (keyCol, textCol) docs.
    * @return (queryId, docKey, rank, score) with rank 1..k under
    *         (score desc, docKey asc). */
  def topK(spark: SparkSession, docs: DataFrame, keyCol: String, textCol: String,
           queries: Seq[(Int, String)], k: Int): DataFrame = {
    import spark.implicits._
    val tok = tokens(docs, keyCol, textCol).persist()
    val n = docs.count()
    val dl = tok.groupBy($"docKey").agg(count(lit(1)).as("dlen"))
    val avgdl = tok.count().toDouble / n
    val qterms = queries.flatMap { case (qid, q) =>
      graft.core.Text.tokenize(q).distinct.map(t => (qid, t))
    }.toDF("queryId", "term")
    val allQTerms = qterms.select("term").distinct()
    val df = tok.join(broadcast(allQTerms), "term")
      .groupBy($"term").agg(countDistinct($"docKey").as("df"))
    val tf = tok.join(broadcast(qterms), "term")
      .groupBy($"queryId", $"term", $"docKey").agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "docKey")
      .withColumn("contrib",
        log(lit(1.0) + (lit(n.toDouble) - $"df" + 0.5) / ($"df" + 0.5)) *
          ($"tf" * 2.2) / ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dlen" / avgdl)))
      .groupBy($"queryId", $"docKey").agg(sum($"contrib").as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"queryId").orderBy($"score".desc, $"docKey".asc)
    val out = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"queryId", $"docKey", $"rank", $"score")
    out
  }
}
