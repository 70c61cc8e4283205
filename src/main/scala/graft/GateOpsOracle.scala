package graft

/** DuckDB oracle SQL for GateOps queries. Dialect notes: list lambdas via
  * list_filter/list_distinct, regexp_extract_all, generate_series table
  * function, '::DOUBLE[]' casts, 'g' flag on regexp_replace (DuckDB
  * replaces first match by default, Spark replaces all). */
object GateOpsOracle {

  private val AugExact =
    """aug AS (SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50)""".stripMargin

  private val AugNear =
    """aug AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000
      | UNION ALL SELECT doc_id + 100000 AS doc_id, text || ' zz extra' AS text
      | FROM documents WHERE doc_id < 1000 AND doc_id % 25 = 0)""".stripMargin

  val dedupExact: String =
    s"""WITH $AugExact
       |SELECT md5(text) AS text_md5, count(*) AS cnt, min(doc_id) AS min_doc
       |FROM aug GROUP BY md5(text) HAVING count(*) > 1 ORDER BY min_doc""".stripMargin

  private def jaccardSql(corpusPred: String, minJ: Double): String =
    s"""WITH $AugNear,
       |sub AS (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
       |        FROM aug WHERE $corpusPred),
       |sh AS (SELECT DISTINCT doc_id,
       |       unnest(list_transform(range(1, greatest(length(norm) - 4, 1) + 1),
       |              i -> substr(norm, CAST(i AS INT), 5))) AS shingle
       |       FROM sub WHERE length(norm) > 0),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |          FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id
       |          GROUP BY x.doc_id, y.doc_id),
       |j AS (SELECT a, b, inter * 1.0 / (sa.sz + sb.sz - inter) AS jacc
       |      FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b)
       |SELECT a, b, CAST(round(jacc * 10000) AS BIGINT) AS jacc_q
       |FROM j WHERE jacc >= $minJ ORDER BY a, b""".stripMargin

  val dedupJaccard: String = jaccardSql("doc_id % 25 = 0 AND doc_id % 100000 < 500", 0.4)

  /** LSH is engine-side machinery; its verified output equals the exact
    * j >= 0.8 pair set (near-dup pairs sit at j ~ 0.95, far from the LSH
    * recall cliff — see GateOps.dedupMinhash). */
  val dedupMinhash: String = jaccardSql("TRUE", 0.8)

  val dedupEmbed: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 5 = 0)
      |SELECT x.vec_id AS a, y.vec_id AS b,
      |  CAST(round(list_cosine_similarity(x.v, y.v) * 10000) AS BIGINT) AS sim_q
      |FROM e x, e y
      |WHERE x.vec_id < y.vec_id AND list_cosine_similarity(x.v, y.v) >= 0.35
      |ORDER BY a, b""".stripMargin

  val textQuality: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
      |  CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS BIGINT) AS n_stop,
      |  CASE WHEN len(toks) > 0
      |    THEN CAST(round(len(list_distinct(toks)) * 10000.0 / len(toks)) AS BIGINT) ELSE 0 END AS ttr_q,
      |  CASE WHEN len(toks) > 0
      |    THEN CAST(round(len(list_filter(toks, x -> x = 'the' OR x = 'a')) * 10000.0 / len(toks)) AS BIGINT) ELSE 0 END AS stop_q
      |FROM t ORDER BY doc_id""".stripMargin

  val textTokens: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_alnum,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws
      |FROM documents ORDER BY doc_id""".stripMargin

  val textLangId: String =
    """WITH tok AS (SELECT doc_id, t AS term FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
      |    FROM documents) u WHERE t <> ''),
      |m AS (SELECT * FROM (VALUES ('de','der'),('de','die'),('de','und'),
      |  ('en','the'),('en','a'),('en','of'),('es','el'),('es','los'),('es','y'),
      |  ('fr','le'),('fr','la'),('fr','et')) v(lang, term)),
      |cnt AS (SELECT tok.doc_id, m.lang, count(*) AS c FROM tok JOIN m USING (term)
      |        GROUP BY tok.doc_id, m.lang),
      |best AS (SELECT doc_id, lang,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn
      |  FROM cnt WHERE c > 0)
      |SELECT d.doc_id, coalesce(b.lang, 'unknown') AS lang_pred
      |FROM documents d LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  val textSimhash: String =
    """WITH tf AS (SELECT doc_id, t AS term, count(*) AS w FROM (
      |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
      |    FROM documents) u WHERE t <> '' GROUP BY doc_id, t),
      |h AS (SELECT doc_id, w, md5(term) AS hex FROM tf),
      |b AS (SELECT doc_id, g.i AS i,
      |  sum(w * (2 * (((strpos('0123456789abcdef', substr(hex, CAST(g.i // 4 AS INT) + 1, 1)) - 1)
      |                 // CAST(pow(2, 3 - (g.i % 4)) AS INT)) % 2) - 1)) AS acc
      |  FROM h, generate_series(0, 59) AS g(i) GROUP BY doc_id, g.i)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN acc > 0 THEN CAST(pow(2, 59 - i) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val textFingerprint: String =
    """SELECT doc_id,
      |  substr(md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))), 1, 15) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  private def annSql(simExpr: String, qVecId: Long, asc: Boolean): String = {
    val dir = if (asc) "ASC" else "DESC"
    s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = $qVecId),
       |s AS (SELECT vec_id, $simExpr AS sim FROM embeddings, q),
       |r AS (SELECT vec_id, row_number() OVER (ORDER BY sim $dir, vec_id ASC) AS rank,
       |      CAST(round(sim * 10000) AS BIGINT) AS sim_q FROM s)
       |SELECT vec_id, rank, sim_q FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin
  }

  val annCosine: String = annSql("list_cosine_similarity(embedding::DOUBLE[], q.qv)", 0, asc = false)
  val annDot: String = annSql("list_inner_product(embedding::DOUBLE[], q.qv)", 0, asc = false)
  val annL2: String = annSql("list_distance(embedding::DOUBLE[], q.qv)", 0, asc = true)
  val annIvf: String = annSql("list_cosine_similarity(embedding::DOUBLE[], q.qv)", 1, asc = false)
  val annPq: String = annSql("list_distance(embedding::DOUBLE[], q.qv)", 2, asc = true)
  val annGraph: String = annSql("list_cosine_similarity(embedding::DOUBLE[], q.qv)", 3, asc = false)
  val annBq: String = annSql("list_cosine_similarity(embedding::DOUBLE[], q.qv)", 4, asc = false)
  val annLvq: String = annSql("list_cosine_similarity(embedding::DOUBLE[], q.qv)", 5, asc = false)

  val annThreshold: String =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 6),
      |s AS (SELECT vec_id, list_cosine_similarity(embedding::DOUBLE[], q.qv) AS sim
      |      FROM embeddings, q)
      |SELECT vec_id, CAST(round(sim * 10000) AS BIGINT) AS sim_q
      |FROM s WHERE sim >= 0.25 ORDER BY vec_id""".stripMargin

  // even doc_id: the real BMP header parse must recover the synthesized
  // dimensions (file size = 54-byte header + height * 4-padded 24bpp row
  // stride); odd doc_id: the stub formula over the raw text bytes
  val multimodalMeta: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0
      |    THEN CAST(54 + (doc_id % 25 + 1) * (((doc_id % 40 + 1) * 3 + 3) // 4 * 4) AS BIGINT)
      |    ELSE CAST(octet_length(encode(text)) AS BIGINT) END AS n_bytes,
      |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 40 + 1 AS BIGINT)
      |    ELSE CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) END AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 25 + 1 AS BIGINT)
      |    ELSE CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) END AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN CAST(1 AS BIGINT)
      |    ELSE CAST(ascii(substr(text, 1, 1)) % 7 + 1 AS BIGINT) END AS frames
      |FROM documents ORDER BY doc_id""".stripMargin

  val relQ1: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
      |  CAST(round(sum(l_extendedprice * (1.0 - l_discount))) AS BIGINT) AS rev_q,
      |  CAST(round(avg(l_discount) * 10000) AS BIGINT) AS avg_disc_q,
      |  count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val relJoinTop10: String =
    """WITH agg AS (
      |  SELECT c_custkey, c_name, CAST(round(sum(o_totalprice)) AS BIGINT) AS rev_q,
      |         count(*) AS n_orders
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_custkey, c_name),
      |r AS (SELECT *, row_number() OVER (ORDER BY rev_q DESC, c_custkey ASC) AS rank FROM agg)
      |SELECT rank, c_custkey, c_name, rev_q, n_orders FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin

  val relWindow: String =
    """WITH r AS (SELECT l_suppkey, l_orderkey, l_linenumber,
      |  row_number() OVER (PARTITION BY l_suppkey
      |    ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC) AS rn
      |  FROM lineitem WHERE l_suppkey < 20)
      |SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM r WHERE rn <= 2
      |ORDER BY l_suppkey, rn""".stripMargin

  val relDistinct: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val relSetops: String =
    """SELECT
      |  (SELECT count(*) FROM (SELECT p_partkey FROM part EXCEPT SELECT l_partkey FROM lineitem)) AS n_unreferenced,
      |  (SELECT count(*) FROM (SELECT p_partkey FROM part INTERSECT SELECT l_partkey FROM lineitem)) AS n_referenced""".stripMargin

  val eventsHourly: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h_epoch, event_type,
      |  count(*) AS cnt, CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_q
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val eventsSessions: String =
    """WITH x AS (SELECT user_id, ts,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      |  FROM events),
      |y AS (SELECT user_id,
      |  CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM x)
      |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM y GROUP BY user_id ORDER BY user_id""".stripMargin
}
