package graft.core

/** Frozen text kernels: tokenizer, HTML extractor, BM25 scoring math.
  *
  * The tokenizer and extractor define the engine's per-row invariants
  * (BASELINE input_hint: byte-identical extracted text per url) and are
  * treated as frozen golden code — any change is a format-version bump,
  * the lesson of the reference's on-disk header versioning
  * (jvector `graph/disk/Header.java:55-67`).
  */
object Text {

  private val TokenSplit = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** Tokenizer: lowercase, split on runs of anything outside [a-z0-9],
    * drop empties. Deliberately expressible in ANSI SQL
    * (`string_split_regex(lower(text), '[^a-z0-9]+')`) so the DuckDB
    * oracle tokenizes identically. Pattern precompiled — this is the
    * hottest scalar in the build path. */
  def tokenize(text: String): Array[String] =
    TokenSplit.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)

  /** tokenize(text).length without allocating tokens — the docLen pass
    * over the corpus needs only the count. ASCII fast path (token chars
    * after lowercasing are exactly [a-zA-Z0-9]); any non-ASCII text falls
    * back to the real tokenizer so the frozen semantics hold. */
  def countTokens(text: String): Int = {
    var i = 0
    val n = text.length
    while (i < n && text.charAt(i) < 128) i += 1
    if (i < n) return tokenize(text).length
    var count = 0
    var inTok = false
    i = 0
    while (i < n) {
      val c = text.charAt(i)
      val alnum = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
        (c >= 'A' && c <= 'Z')
      if (alnum && !inTok) count += 1
      inTok = alnum
      i += 1
    }
    count
  }

  /** Per-doc term frequencies, with docLen = total token count.
    *
    * Hottest kernel of the build path (every byte of the corpus flows
    * through it), so ASCII text takes a hand-rolled single-pass splitter:
    * no regex engine, no lowercased copy of the whole text, no
    * intermediate token array — one String allocation per token and one
    * hash upsert. Semantics are byte-identical to `tokenize` (ASCII
    * lowercase == Locale.ROOT lowercase for chars < 128; token = maximal
    * [a-z0-9] run); any non-ASCII text falls back to the frozen tokenizer,
    * and the equivalence is property-tested over random inputs. */
  def termFreqs(text: String): (Array[(String, Int)], Int) = {
    var i = 0
    val n = text.length
    while (i < n && text.charAt(i) < 128) i += 1
    if (i < n) return termFreqsSlow(text)
    val m = new java.util.HashMap[String, Int]()
    var buf = new Array[Char](32)
    var bl = 0
    var count = 0
    i = 0
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      val alnum = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')
      if (alnum) {
        if (bl == buf.length) buf = java.util.Arrays.copyOf(buf, bl * 2)
        buf(bl) = lc
        bl += 1
      } else if (bl > 0) {
        val tok = new String(buf, 0, bl)
        m.put(tok, m.getOrDefault(tok, 0) + 1)
        count += 1
        bl = 0
      }
      i += 1
    }
    (packSorted(m), count)
  }

  /** Receiver for [[tokenizeInto]]: one call per token, in text order.
    * `buf(0 until len)` is the lowercased token; the array is REUSED across
    * calls — implementations must copy if they retain it. */
  trait TokenSink {
    def token(buf: Array[Char], len: Int): Unit
  }

  /** Streaming tokenizer for the SPIMI build hot path: emits each token of
    * ASCII `text` into `sink` (token chars, no String) and returns the token
    * count. Token semantics are byte-identical to [[tokenize]] on ASCII
    * input (lowercase, maximal [a-z0-9] runs) — property-tested against the
    * frozen tokenizer. Returns -1 WITHOUT calling the sink if `text` has any
    * non-ASCII char, so callers can fall back to [[termFreqs]] atomically.
    * This is the zero-allocation analog of the reference's primitive-array
    * build kernels (jvector `graph/NodeArray.java:52-132` grows primitive
    * arrays instead of boxing per element). */
  def tokenizeInto(text: String, sink: TokenSink): Int = {
    var i = 0
    val n = text.length
    while (i < n && text.charAt(i) < 128) i += 1
    if (i < n) return -1
    var buf = new Array[Char](32)
    var bl = 0
    var count = 0
    i = 0
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else ' '
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      val alnum = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')
      if (alnum) {
        if (bl == buf.length) buf = java.util.Arrays.copyOf(buf, bl * 2)
        buf(bl) = lc
        bl += 1
      } else if (bl > 0) {
        sink.token(buf, bl)
        count += 1
        bl = 0
      }
      i += 1
    }
    count
  }

  private def termFreqsSlow(text: String): (Array[(String, Int)], Int) = {
    val toks = tokenize(text)
    val m = new java.util.HashMap[String, Int]()
    var i = 0
    while (i < toks.length) {
      m.put(toks(i), m.getOrDefault(toks(i), 0) + 1)
      i += 1
    }
    (packSorted(m), toks.length)
  }

  private def packSorted(m: java.util.HashMap[String, Int]): Array[(String, Int)] = {
    val out = new Array[(String, Int)](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(j) = (e.getKey, e.getValue); j += 1 }
    // deterministic order (term asc) so downstream fp sums are reproducible
    scala.util.Sorting.quickSort(out)(Ordering.by(_._1))
    out
  }

  /** Frozen extractor html -> text: strips tags, decodes the five basic
    * entities, collapses whitespace. Paired with the synthetic corpus
    * generator so extract(html) == text byte-identically per url (analog of
    * the reference's golden-format test `TestOnDiskGraphIndex.java:196-213`). */
  def extract(html: String): String = {
    val noTags = html.replaceAll("<[^>]*>", " ")
    val decoded = noTags
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")
    decoded.replaceAll("\\s+", " ").trim
  }

  // ---------------- BM25 (k1 = 1.2, b = 0.75) ----------------
  // Single scoring function of the engine, the role VectorSimilarityFunction
  // plays in the reference (jvector vector/VectorSimilarityFunction.java:37-84).

  val K1 = 1.2
  val B = 0.75

  /** idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) — Robertson-Sparck Jones,
    * always positive. */
  def idf(df: Long, n: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** Length-normalized tf part, independent of df — what block-max metadata
    * upper-bounds (query-time bound = idf * partial, the ADC-style
    * factorization of jvector `pq/PQDecoder.java:38-60`: per-query constants
    * on the driver, mul/add per posting on executors). */
  def tfPartial(tf: Int, docLen: Long, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * docLen / avgdl))

  def score(tf: Int, docLen: Long, df: Long, n: Long, avgdl: Double): Double =
    idf(df, n) * tfPartial(tf, docLen, avgdl)
}
