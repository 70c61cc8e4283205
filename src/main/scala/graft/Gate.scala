package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.index._

/** Driver-gate queries: each entry runs the ENGINE over the driver's
  * parquet tables at `sfDir` and is paired (in [[GateOracle]]) with ANSI
  * SQL that DuckDB runs on the same tables — the correctness gate of the
  * round (Verify.scala contract).
  *
  * The `documents` table (doc_id, text, lang, source, n_chars) is adapted
  * to the engine's input_hint shape (url, text, lang) with
  * url = "doc://%012d" % doc_id — zero-padded so lexicographic url order
  * == numeric doc_id order, making the engine's dense-ordinal tie-break
  * (docId asc) identical to the oracle's (doc_id asc). Results map back by
  * parsing the url, never by assuming ordinal == doc_id.
  */
object Gate {

  /** Fixed query set over the documents vocabulary: head ("the","a"),
    * mid, single-term, unknown-term and repeated-term classes — the
    * engine's reference query set (FIXTURES.md §2). */
  val Queries: Seq[(Int, String)] = Seq(
    0 -> "spark merge window",
    1 -> "vector hash join",
    2 -> "customer order stream",
    3 -> "the a",
    4 -> "slow fast batch",
    5 -> "scan",
    6 -> "data query line nosuchterm",
    7 -> "group group filter")

  val DictTerms: Seq[String] = Seq("spark", "merge", "window", "vector", "hash",
    "join", "the", "a", "scan", "group", "filter", "nosuchterm")

  val TombstonePred = "doc_id % 10 = 7" // deterministic tombstone set

  // ---------------- engine plumbing ----------------

  private val cache = scala.collection.concurrent.TrieMap[String, InvertedIndex]()
  private val compactedCache = scala.collection.concurrent.TrieMap[String, InvertedIndex]()

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** documents -> input_hint shape. */
  def asPages(docs: DataFrame): DataFrame =
    docs.select(format_string("doc://%012d", col("doc_id")).as("url"),
      col("text"), col("lang"))

  def index(spark: SparkSession, sfDir: String): InvertedIndex =
    cache.getOrElseUpdate(sfDir, {
      IndexBuilder.build(spark, asPages(documents(spark, sfDir)),
        IndexBuilder.Options(numShards = 16, rangePartitions = 16)).prepared()
    })

  def tombstoneDocIds(spark: SparkSession, sfDir: String) = {
    import spark.implicits._
    index(spark, sfDir).docs
      .withColumn("origId", expr("cast(substring(url, 7) as long)"))
      .filter($"origId" % 10 === 7)
      .select($"docId").as[Long]
  }

  def compacted(spark: SparkSession, sfDir: String): InvertedIndex =
    compactedCache.getOrElseUpdate(sfDir,
      index(spark, sfDir).compact(tombstoneDocIds(spark, sfDir)))

  /** Map engine (docId, score) to (doc_id, rank, score_q). */
  private def toGateResult(ix: InvertedIndex, res: DataFrame): DataFrame = {
    val spark = res.sparkSession
    import spark.implicits._
    val withId = res.join(ix.docs.select($"docId", $"url"), "docId")
      .withColumn("doc_id", expr("cast(substring(url, 7) as long)"))
    val w = Window.orderBy($"score".desc, $"doc_id".asc)
    withId
      .withColumn("rank", row_number().over(w))
      .withColumn("score_q", round($"score" * 10000).cast("long"))
      .select($"doc_id", $"rank", $"score_q")
      .orderBy($"rank")
  }

  // ---------------- gate queries (engine side) ----------------

  def bm25Top10(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    toGateResult(ix, ix.search(Queries.head._2, 10))
  }

  def bm25Multi(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    import spark.implicits._
    // the Dataset-of-queries driver (query-log scale path); searchAll
    // (driver-side batch) is asserted equivalent in EngineSpec
    val res = ix.searchMany(Queries.toDS(), 10)
    val withId = res.join(ix.docs.select($"docId", $"url"), "docId")
      .withColumn("doc_id", expr("cast(substring(url, 7) as long)"))
    val w = Window.partitionBy($"queryId").orderBy($"score".desc, $"doc_id".asc)
    withId.withColumn("rank", row_number().over(w))
      .withColumn("score_q", round($"score" * 10000).cast("long"))
      .select($"queryId".as("query_id"), $"doc_id", $"rank", $"score_q")
      .orderBy($"query_id", $"rank")
  }

  def bm25Filtered(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    import spark.implicits._
    toGateResult(ix, ix.search("slow fast batch", 10, docFilter = Some($"lang" === "en")))
  }

  def bm25Threshold(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    import spark.implicits._
    val res = ix.searchThreshold("spark merge window", 1.2)
    res.join(ix.docs.select($"docId", $"url"), "docId")
      .withColumn("doc_id", expr("cast(substring(url, 7) as long)"))
      .withColumn("score_q", round($"score" * 10000).cast("long"))
      .select($"doc_id", $"score_q")
      .orderBy($"doc_id")
  }

  def bm25Tombstone(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    toGateResult(ix, ix.search("vector hash join", 10,
      tombstones = Some(tombstoneDocIds(spark, sfDir))))
  }

  def bm25Compacted(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = compacted(spark, sfDir)
    toGateResult(ix, ix.search("vector hash join", 10))
  }

  def indexDict(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    import spark.implicits._
    ix.dict.filter($"term".isin(DictTerms: _*))
      .select($"term", $"df", $"cf")
      .orderBy($"term")
  }

  def indexStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    import spark.implicits._
    Seq((ix.stats.numDocs, ix.stats.totalTokens,
      math.round(ix.stats.avgdl * 10000))).toDF("n_docs", "total_tokens", "avgdl_q")
  }

  def indexDoclen(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    import spark.implicits._
    ix.docs.withColumn("doc_id", expr("cast(substring(url, 7) as long)"))
      .filter($"doc_id" < 50)
      .select($"doc_id", $"docLen".cast("long").as("dlen"))
      .orderBy($"doc_id")
  }

  /** Decode compressed blocks back to raw postings — end-to-end proof of
    * the codec against the SQL-side term frequencies. */
  def codecRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ix = index(spark, sfDir)
    import spark.implicits._
    val terms = Seq("spark", "vector", "the")
    val decoded = ix.blocks.filter($"term".isin(terms: _*)).flatMap { b =>
      val ids = graft.core.Codec.decodeDocIds(b.docBytes, -1L)
      val tfs = graft.core.Codec.decodeTfs(b.tfBytes)
      ids.indices.map(i => (b.term, ids(i), tfs(i)))
    }.toDF("term", "docId", "tf")
    decoded.join(ix.docs.select($"docId", $"url"), "docId")
      .withColumn("doc_id", expr("cast(substring(url, 7) as long)"))
      .select($"term", $"doc_id", $"tf".cast("long").as("tf"))
      .orderBy($"term", $"doc_id")
  }
}

/** DuckDB-dialect oracle SQL for each Gate query (driver runs these on the
  * same parquet registered as tables named by file basename). */
object GateOracle {

  /** Shared scaffold: tokenize exactly like core.Text.tokenize. */
  private def scaffold(corpus: String): String =
    s"""WITH corpus AS ($corpus),
       |tok AS (SELECT doc_id, t AS term FROM (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
       |  FROM corpus) u WHERE t <> ''),
       |dl AS (SELECT doc_id, count(*) AS dlen FROM tok GROUP BY doc_id),
       |st AS (SELECT (SELECT count(*) FROM corpus) AS n,
       |       (SELECT sum(dlen)*1.0 FROM dl)/(SELECT count(*) FROM corpus) AS avgdl)""".stripMargin

  private def qlist(terms: Seq[String]): String =
    terms.map(t => s"'$t'").mkString("[", ",", "]")

  /** Single-query BM25 top-k with optional candidate predicate. */
  def bm25(terms: Seq[String], k: Int, pred: String = "TRUE",
           corpus: String = "SELECT doc_id, text, lang FROM documents"): String =
    s"""${scaffold(corpus)},
       |qt AS (SELECT DISTINCT unnest(${qlist(terms)}) AS term),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok JOIN qt USING (term) GROUP BY term),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok JOIN qt USING (term) GROUP BY doc_id, term),
       |sc AS (SELECT tf.doc_id,
       |  sum(ln(1.0 + (st.n - df.df + 0.5)/(df.df + 0.5)) * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / st.avgdl))) AS score
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       |  GROUP BY tf.doc_id),
       |ranked AS (SELECT sc.doc_id,
       |  row_number() OVER (ORDER BY score DESC, sc.doc_id ASC) AS rank,
       |  CAST(round(score*10000) AS BIGINT) AS score_q
       |  FROM sc JOIN corpus USING (doc_id) WHERE $pred)
       |SELECT doc_id, rank, score_q FROM ranked WHERE rank <= $k ORDER BY rank""".stripMargin

  /** Multi-query batch variant. */
  def bm25Multi(queries: Seq[(Int, String)], k: Int): String = {
    val vals = queries.flatMap { case (qid, q) =>
      graft.core.Text.tokenize(q).distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""${scaffold("SELECT doc_id, text, lang FROM documents")},
       |qt AS (SELECT * FROM (VALUES $vals) AS v(query_id, term)),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
       |       JOIN (SELECT DISTINCT term FROM qt) q USING (term) GROUP BY term),
       |tf AS (SELECT qt.query_id, tok.doc_id, tok.term, count(*) AS tf
       |       FROM tok JOIN qt USING (term) GROUP BY qt.query_id, tok.doc_id, tok.term),
       |sc AS (SELECT tf.query_id, tf.doc_id,
       |  sum(ln(1.0 + (st.n - df.df + 0.5)/(df.df + 0.5)) * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / st.avgdl))) AS score
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       |  GROUP BY tf.query_id, tf.doc_id),
       |ranked AS (SELECT query_id, doc_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
       |  CAST(round(score*10000) AS BIGINT) AS score_q FROM sc)
       |SELECT query_id, doc_id, rank, score_q FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  def bm25Threshold(terms: Seq[String], tau: Double): String =
    s"""${scaffold("SELECT doc_id, text, lang FROM documents")},
       |qt AS (SELECT DISTINCT unnest(${qlist(terms)}) AS term),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok JOIN qt USING (term) GROUP BY term),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok JOIN qt USING (term) GROUP BY doc_id, term),
       |sc AS (SELECT tf.doc_id,
       |  sum(ln(1.0 + (st.n - df.df + 0.5)/(df.df + 0.5)) * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / st.avgdl))) AS score
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       |  GROUP BY tf.doc_id)
       |SELECT doc_id, CAST(round(score*10000) AS BIGINT) AS score_q
       |FROM sc WHERE score >= $tau ORDER BY doc_id""".stripMargin

  def dict(terms: Seq[String]): String =
    s"""${scaffold("SELECT doc_id, text, lang FROM documents")}
       |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
       |FROM tok WHERE term IN (${terms.map(t => s"'$t'").mkString(",")})
       |GROUP BY term ORDER BY term""".stripMargin

  def stats: String =
    s"""${scaffold("SELECT doc_id, text, lang FROM documents")}
       |SELECT st.n AS n_docs,
       |  CAST((SELECT coalesce(sum(dlen),0) FROM dl) AS BIGINT) AS total_tokens,
       |  CAST(round(st.avgdl*10000) AS BIGINT) AS avgdl_q FROM st""".stripMargin

  def doclen: String =
    s"""${scaffold("SELECT doc_id, text, lang FROM documents")}
       |SELECT d.doc_id, CAST(coalesce(dl.dlen, 0) AS BIGINT) AS dlen
       |FROM corpus d LEFT JOIN dl USING (doc_id)
       |WHERE d.doc_id < 50 ORDER BY d.doc_id""".stripMargin

  def codecRoundtrip(terms: Seq[String]): String =
    s"""${scaffold("SELECT doc_id, text, lang FROM documents")}
       |SELECT term, doc_id, count(*) AS tf FROM tok
       |WHERE term IN (${terms.map(t => s"'$t'").mkString(",")})
       |GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin
}
