package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry exercises an engine capability over the driver's
  * parquet tables; `oracleSql` holds the DuckDB-equivalent SQL the driver
  * cross-checks against (GateOracle). */
object SparkEntry {

  /** Flagship: BM25 top-10 via the full engine (SPIMI build + compressed
    * blocks + block-max WAND) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Gate.bm25Top10(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bm25_top10" -> ((s, d) => Gate.bm25Top10(s, d)),
    "bm25_multi" -> ((s, d) => Gate.bm25Multi(s, d)),
    "bm25_filtered" -> ((s, d) => Gate.bm25Filtered(s, d)),
    "bm25_threshold" -> ((s, d) => Gate.bm25Threshold(s, d)),
    "bm25_tombstone" -> ((s, d) => Gate.bm25Tombstone(s, d)),
    "bm25_compacted" -> ((s, d) => Gate.bm25Compacted(s, d)),
    "index_dict" -> ((s, d) => Gate.indexDict(s, d)),
    "index_stats" -> ((s, d) => Gate.indexStats(s, d)),
    "index_doclen" -> ((s, d) => Gate.indexDoclen(s, d)),
    "codec_roundtrip" -> ((s, d) => Gate.codecRoundtrip(s, d)),
    "dedup_exact" -> ((s, d) => GateOps.dedupExact(s, d)),
    "dedup_jaccard" -> ((s, d) => GateOps.dedupJaccard(s, d)),
    "dedup_minhash" -> ((s, d) => GateOps.dedupMinhash(s, d)),
    "dedup_embed" -> ((s, d) => GateOps.dedupEmbed(s, d)),
    "text_quality" -> ((s, d) => GateOps.textQuality(s, d)),
    "text_tokens" -> ((s, d) => GateOps.textTokens(s, d)),
    "text_langid" -> ((s, d) => GateOps.textLangId(s, d)),
    "text_simhash" -> ((s, d) => GateOps.textSimhash(s, d)),
    "text_fingerprint" -> ((s, d) => GateOps.textFingerprint(s, d)),
    "ann_cosine" -> ((s, d) => GateOps.annCosine(s, d)),
    "ann_dot" -> ((s, d) => GateOps.annDot(s, d)),
    "ann_l2" -> ((s, d) => GateOps.annL2(s, d)),
    "ann_ivf" -> ((s, d) => GateOps.annIvf(s, d)),
    "ann_pq" -> ((s, d) => GateOps.annPq(s, d)),
    "ann_graph" -> ((s, d) => GateOps.annGraph(s, d)),
    "ann_bq" -> ((s, d) => GateOps.annBq(s, d)),
    "ann_lvq" -> ((s, d) => GateOps.annLvq(s, d)),
    "ann_threshold" -> ((s, d) => GateOps.annThreshold(s, d)),
    "multimodal_meta" -> ((s, d) => GateOps.multimodalMeta(s, d)),
    "rel_q1" -> ((s, d) => GateOps.relQ1(s, d)),
    "rel_join_top10" -> ((s, d) => GateOps.relJoinTop10(s, d)),
    "rel_window" -> ((s, d) => GateOps.relWindow(s, d)),
    "rel_distinct" -> ((s, d) => GateOps.relDistinct(s, d)),
    "rel_setops" -> ((s, d) => GateOps.relSetops(s, d)),
    "events_hourly" -> ((s, d) => GateOps.eventsHourly(s, d)),
    "events_sessions" -> ((s, d) => GateOps.eventsSessions(s, d)))

  def oracleSql: Map[String, String] = {
    def terms(q: String) = graft.core.Text.tokenize(q).distinct.toSeq
    Map(
      "bm25_top10" -> GateOracle.bm25(terms(Gate.Queries.head._2), 10),
      "bm25_multi" -> GateOracle.bm25Multi(Gate.Queries, 10),
      "bm25_filtered" -> GateOracle.bm25(terms("slow fast batch"), 10, pred = "lang = 'en'"),
      "bm25_threshold" -> GateOracle.bm25Threshold(terms("spark merge window"), 1.2),
      "bm25_tombstone" -> GateOracle.bm25(terms("vector hash join"), 10,
        pred = s"NOT (${Gate.TombstonePred})"),
      "bm25_compacted" -> GateOracle.bm25(terms("vector hash join"), 10,
        corpus = s"SELECT doc_id, text, lang FROM documents WHERE NOT (${Gate.TombstonePred})"),
      "index_dict" -> GateOracle.dict(Gate.DictTerms),
      "index_stats" -> GateOracle.stats,
      "index_doclen" -> GateOracle.doclen,
      "codec_roundtrip" -> GateOracle.codecRoundtrip(Seq("spark", "vector", "the")),
      "dedup_exact" -> GateOpsOracle.dedupExact,
      "dedup_jaccard" -> GateOpsOracle.dedupJaccard,
      "dedup_minhash" -> GateOpsOracle.dedupMinhash,
      "dedup_embed" -> GateOpsOracle.dedupEmbed,
      "text_quality" -> GateOpsOracle.textQuality,
      "text_tokens" -> GateOpsOracle.textTokens,
      "text_langid" -> GateOpsOracle.textLangId,
      "text_simhash" -> GateOpsOracle.textSimhash,
      "text_fingerprint" -> GateOpsOracle.textFingerprint,
      "ann_cosine" -> GateOpsOracle.annCosine,
      "ann_dot" -> GateOpsOracle.annDot,
      "ann_l2" -> GateOpsOracle.annL2,
      "ann_ivf" -> GateOpsOracle.annIvf,
      "ann_pq" -> GateOpsOracle.annPq,
      "ann_graph" -> GateOpsOracle.annGraph,
      "ann_bq" -> GateOpsOracle.annBq,
      "ann_lvq" -> GateOpsOracle.annLvq,
      "ann_threshold" -> GateOpsOracle.annThreshold,
      "multimodal_meta" -> GateOpsOracle.multimodalMeta,
      "rel_q1" -> GateOpsOracle.relQ1,
      "rel_join_top10" -> GateOpsOracle.relJoinTop10,
      "rel_window" -> GateOpsOracle.relWindow,
      "rel_distinct" -> GateOpsOracle.relDistinct,
      "rel_setops" -> GateOpsOracle.relSetops,
      "events_hourly" -> GateOpsOracle.eventsHourly,
      "events_sessions" -> GateOpsOracle.eventsSessions)
  }
}
