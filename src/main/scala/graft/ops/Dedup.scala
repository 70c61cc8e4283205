package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Analyze

/** Deduplication operators for training-data pipelines, all expressed as
  * declarative DataFrame plans (codegen + shuffle-aware):
  *
  *  - exact dup groups: one hash-aggregate over md5(text) — scales as a
  *    map-side-combined groupBy, no driver state;
  *  - n-gram (char-5-gram) Jaccard: shingle explode -> self-equi-join on
  *    shingle -> count aggregate. The join is the scalable formulation
  *    (candidates only meet if they SHARE a shingle — never all-pairs);
  *  - MinHash + banded LSH: declarative signature aggregate (64 min()
  *    columns over (a·x+b) mod p), band bucketing, bucket equi-join for
  *    candidates, exact-Jaccard verification of candidates only. At
  *    10^12-doc scale only the LSH path survives: its shuffle is
  *    O(docs · bands), and verification touches candidate pairs only.
  */
object Dedup {

  /** trim(regexp_replace(lower(text),'[^a-z0-9]+',' ')) == Analyze.normalize. */
  def normCol(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Exact duplicate groups: (text_md5, cnt, min_key), cnt > 1. */
  def exactGroups(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol).as("k"), md5(col(textCol)).as("text_md5"))
      .groupBy(col("text_md5"))
      .agg(count(lit(1)).as("cnt"), min(col("k")).as("min_key"))
      .filter(col("cnt") > 1)

  /** (key, shingle) distinct char-5-grams of normalized text. */
  def shingles(docs: DataFrame, keyCol: String, textCol: String): DataFrame =
    docs.select(col(keyCol).as("key"), normCol(col(textCol)).as("norm"))
      .filter(length(col("norm")) > 0)
      .select(col("key"), explode(expr(
        """case when length(norm) < 5 then array(norm)
          |else transform(sequence(1, length(norm) - 4), i -> substring(norm, i, 5))
          |end""".stripMargin)).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard over pairs that share >= 1 shingle.
    * Returns (a, b, jacc) with a < b and jacc >= minJ. */
  def jaccardPairs(sh: DataFrame, minJ: Double): DataFrame = {
    val sizes = sh.groupBy(col("key")).agg(count(lit(1)).as("sz"))
    val a = sh.toDF("a", "shingle")
    val b = sh.toDF("b", "shingle")
    val inter = a.join(b, "shingle").filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    withJaccard(inter, sizes, minJ)
  }

  /** Exact Jaccard restricted to a given candidate pair set — the join
    * order that scales: shingles meet the (small) candidate set FIRST, so
    * the shingle equi-join never materializes non-candidate pairs. */
  def jaccardForPairs(sh: DataFrame, pairs: DataFrame, minJ: Double): DataFrame = {
    val sizes = sh.groupBy(col("key")).agg(count(lit(1)).as("sz"))
    val withA = pairs.join(sh.toDF("a", "shingle"), "a")
    val inter = withA.join(sh.toDF("b", "shingle"), Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    withJaccard(inter, sizes, minJ)
  }

  private def withJaccard(inter: DataFrame, sizes: DataFrame, minJ: Double): DataFrame =
    inter
      .join(sizes.toDF("a", "sza"), "a")
      .join(sizes.toDF("b", "szb"), "b")
      .withColumn("jacc", col("inter") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jacc") >= minJ)
      .select(col("a"), col("b"), col("jacc"))

  /** MinHash signatures: one row per key with numHashes min-hash values,
    * computed as a single hash-aggregate (no UDAF needed). The shingle
    * hash (first 7 hex of md5 -> 28-bit int) matches Analyze.shingleHash31. */
  def minHashSignature(sh: DataFrame, numHashes: Int = 64, seed: Long = 42L): DataFrame = {
    val params = Analyze.minHashParams(numHashes, seed)
    val x = conv(substring(md5(col("shingle")), 1, 7), 16, 10).cast("long")
    val hashed = sh.select(col("key"), x.as("x"))
    val aggs = params.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("x") + lit(b)) % lit(Analyze.MinHashP)).as(s"h$i")
    }
    hashed.groupBy(col("key")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded-LSH candidate pairs + exact-Jaccard verification.
    * numHashes = bands * rowsPerBand; a pair is a candidate iff one band's
    * signature slice matches exactly; candidates (only) are then verified
    * with exact shingle Jaccard >= threshold. */
  def lshNearDupPairs(docs: DataFrame, keyCol: String, textCol: String,
                      threshold: Double, numHashes: Int = 64,
                      bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val sh = shingles(docs, keyCol, textCol).persist()
    val sig = minHashSignature(sh, numHashes)
    // band rows: (key, band, bucket) where bucket = the band's slice
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", (0 until rows).map(r => col(s"h${bnd * rows + r}")): _*).as("bucket"))
    }
    val banded = sig.select(col("key"), explode(array(bandCols: _*)).as("bb"))
      .select(col("key"), col("bb.band"), col("bb.bucket"))
    val l = banded.toDF("a", "band", "bucket")
    val r = banded.toDF("b", "band", "bucket")
    val candidates = l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // verify candidates exactly (scales: |candidates| << all pairs, and
    // the Jaccard join is restricted to them from the start)
    jaccardForPairs(sh, candidates, threshold)
  }

  /** Embedding near-duplicates: pairs with cosine >= threshold. All-pairs
    * formulation for the gate subset; the scale path is Ann.ivf bucketing. */
  def embedCosinePairs(emb: DataFrame, keyCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val e = emb.select(col(keyCol).as("k"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val a = e.toDF("a", "va")
    val b = e.toDF("b", "vb")
    val dot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(col("va"), x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(col("vb"), x => x * x), lit(0.0), (acc, x) => acc + x))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("sim", dot / (na * nb))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }
}
