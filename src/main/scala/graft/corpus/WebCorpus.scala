package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.Text

/** Deterministic synthetic Common-Crawl-style corpus matching the
  * BASELINE input_hint schema (url, warc_ts, html, text, lang) — the
  * engine's SiftSmall-style committed fixture (reference pattern:
  * jvector-examples SiftSmall.java:116-123 + DataSet.java:32-70), but
  * generated in-code with a fixed seed (zero-egress, FIXTURES.md §1).
  *
  * Distributed + deterministic: doc i's content depends only on (seed, i),
  * generated per-partition from a range Dataset — no driver materialization,
  * scales to any row count.
  *
  * Text is Zipf-distributed over a synthetic vocabulary (head-term skew the
  * salted merge must handle) plus per-doc rare terms; html wraps text in
  * boilerplate so extract(html) == text byte-identically (the per-row
  * invariant).
  */
object WebCorpus {

  final case class Page(url: String, warc_ts: java.sql.Timestamp,
                        html: Array[Byte], text: String, lang: String)

  val VocabSize = 50000
  private val Langs = Array("en", "en", "en", "en", "en", "en", "en", "en", "en",
    "de", "fr", "ru", "zh") // ~69% en

  /** Zipf-ish sampler over term ranks via inverse-CDF power approximation
    * (s ≈ 1.07): rank = floor(V^u) biases small ranks heavily. V^u is
    * precomputed on a 64k-entry grid (pow per token would dominate
    * generation and pollute build-throughput measurements). */
  private val ZipfGrid: Array[Int] = Array.tabulate(65537) { i =>
    val r = math.pow(VocabSize.toDouble, i / 65536.0) - 1.0
    math.min(VocabSize - 1, r.toInt)
  }
  @inline private def zipfRank(u: Double): Int = ZipfGrid((u * 65536.0).toInt)

  private val TermCache: Array[String] = Array.tabulate(VocabSize)(i => "t" + i)
  def term(rank: Int): String = TermCache(rank)

  /** Deterministic page for ordinal i under seed. */
  def page(seed: Long, i: Long): Page = {
    val rnd = new java.util.Random(seed * 1000003L + i * 7919L)
    // lognormal doc length (mu=5.3 sigma=0.7 -> mean ~260 tokens), capped
    val len = math.max(8, math.min(2000,
      math.exp(5.3 + 0.7 * rnd.nextGaussian()).toInt))
    val sb = new java.lang.StringBuilder(len * 6)
    var t = 0
    while (t < len) {
      if (t > 0) sb.append(' ')
      if (rnd.nextDouble() < 0.02) sb.append(s"rare${i}x${rnd.nextInt(4)}")
      else sb.append(term(zipfRank(rnd.nextDouble())))
      t += 1
    }
    val text = sb.toString
    val lang = Langs(rnd.nextInt(Langs.length))
    val url = f"https://site${math.floorMod(i * 2654435761L, 997)}%03d.example/p/$i%012d"
    val ts = new java.sql.Timestamp(1704067200000L + (math.floorMod(i * 31557L, 31536000L)) * 1000L)
    // no other text nodes than the body paragraph, so extract(html) == text
    // byte-identically (the per-row invariant; golden test asserts it)
    val html = ("<html><head><title></title></head><body><p>" +
      text.replace("&", "&amp;") + "</p></body></html>").getBytes("UTF-8")
    Page(url, ts, html, text, lang)
  }

  /** Generate n pages as a DataFrame, distributed over `partitions`. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => page(seed, i)).toDF()
  }
}
