package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Codec, Text}

/** SPIMI-style index build over typed Datasets (SURVEY.md §3.2 "our
  * equivalent"): the Spark re-architecture of jvector's parallel bulk
  * build (GraphIndexBuilder.build, graph/GraphIndexBuilder.java:156-166) —
  * Spark stage boundaries replace its ForkJoinPool + lock-free CAS
  * machinery; each capability maps to a declarative stage:
  *
  *  1. dense docId assignment: repartitionByRange(url) + per-partition
  *     counts + prefix-sum offsets (NOT row_number over a single partition,
  *     NOT monotonically_increasing_id — ordinal renumbering, jvector
  *     OnDiskGraphIndexWriter.getSequentialRenumbering:163-176);
  *  2. tokenize + per-doc tf: narrow mapPartitions, no shuffle (tf is
  *     doc-local by definition — the SPIMI insight);
  *  3. global stats (N, avgdl): one tiny aggregate (the medioid/centroid
  *     refresh analog, GraphIndexBuilder.approximateMedioid:552-576);
  *  4. posting merge: repartitionByRange(term, shard, docId) — the range
  *     partitioner's sampled split points cut head terms (Zipf skew) across
  *     partitions at docId boundaries, which is the salting: the docId
  *     subrange is the salt key, and no second-level merge is needed
  *     because blocks are self-contained docId runs;
  *  5. block encode: delta-gap + varbyte (Codec) with exact block-max
  *     metadata; dictionary aggregate (map-side partial combine).
  *
  * The chunked variant (buildResumable) writes one segment dir + manifest
  * row per docId-range chunk; a restart skips committed chunks — the
  * incremental-write / resume protocol of jvector's on-disk writer
  * (OnDiskGraphIndexWriter.writeInline:62-84, proven incremental ≡ bulk in
  * TestOnDiskGraphIndex.java:215-262, which our resume test mirrors).
  */
object IndexBuilder {

  val FormatVersion = 1L

  final case class Options(
      numShards: Int = 32,
      rangePartitions: Int = 32,
      blockSize: Int = Codec.BlockSize)

  /** Normalize an input table to (url, text, lang); html-only inputs run
    * the frozen extractor. */
  def normalize(spark: SparkSession, webpages: DataFrame): DataFrame = {
    import spark.implicits._
    val cols = webpages.columns.toSet
    val withText =
      if (cols.contains("text")) webpages
      else webpages.withColumn("text",
        udf((h: Array[Byte]) => Text.extract(new String(h, "UTF-8")))
          .apply($"html"))
    withText.select($"url",
      $"text",
      (if (cols.contains("lang")) coalesce($"lang", lit("")) else lit(""))
        .as("lang"))
  }

  /** One-shot build. Input must have (url, text|html, lang?). */
  def build(spark: SparkSession, webpages: DataFrame,
            opts: Options = Options()): InvertedIndex = {
    import spark.implicits._
    val in = normalize(spark, webpages).as[(String, String, String)]

    // --- stage 1: deterministic dense docIds ---
    val parts = opts.rangePartitions
    val sorted = in.repartitionByRange(parts, $"url").sortWithinPartitions($"url")
      .persist()
    val counts = sorted.mapPartitions { it =>
      Iterator((TaskContext.getPartitionId(), it.size.toLong))
    }.collect().toMap
    val offsets = new Array[Long](parts + 1)
    (0 until parts).foreach { p =>
      offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L)
    }
    val numDocs = offsets(parts)
    val nShards = opts.numShards
    val offB = spark.sparkContext.broadcast(offsets)
    @inline def shardOf(docId: Long): Int =
      if (numDocs == 0) 0
      else math.min(nShards - 1, (docId * nShards / numDocs).toInt)

    // --- stage 2a: doc metadata (docLen) — narrow ---
    val docs = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = offB.value(pid)
      it.map { case (url, text, lang) =>
        val d = DocMeta(i, shardOf(i), url, Text.tokenize(text).length, lang)
        i += 1
        d
      }
    }.persist()

    // --- stage 3: global stats (tiny agg) ---
    val (totTok) = if (numDocs == 0) 0L
      else docs.agg(sum($"docLen")).as[Long].head()
    val avgdl = if (numDocs == 0) 0.0 else totTok.toDouble / numDocs
    val stats = IndexStats(numDocs, totTok, avgdl, nShards)

    // --- stage 2b: postings — narrow (SPIMI: tf computed doc-locally) ---
    val postings = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = offB.value(pid)
      it.flatMap { case (_, text, _) =>
        val docId = i
        i += 1
        val (tfs, len) = Text.termFreqs(text)
        tfs.iterator.map { case (t, tf) =>
          Posting(t, shardOf(docId), docId, tf, len)
        }
      }
    }

    // --- stage 4+5: range-partitioned merge + block encode ---
    val blocks = encodeBlocks(spark, postings, opts).persist()

    // --- dictionary: df/cf/bound inputs per term (map-side combined agg) ---
    val dict = dictFromBlocks(spark, blocks).persist()

    // force caches before dropping the sorted input: repartitionByRange
    // re-samples on recompute, so lineage replay must never re-run it
    blocks.count(); dict.count()
    sorted.unpersist()
    InvertedIndex(spark, docs, blocks, dict, stats)
  }

  /** Dictionary from blocks: df = Σ block n (one posting per doc), cf from
    * decoded tfs, (maxTf, minDl) = global tf-part bound inputs. Map-side
    * partial aggregation is automatic (hash agg). */
  def dictFromBlocks(spark: SparkSession, blocks: Dataset[Block]): Dataset[DictEntry] = {
    import spark.implicits._
    val cfOf = udf((b: Array[Byte]) => Codec.decodeTfs(b).map(_.toLong).sum)
    blocks.groupBy($"term").agg(
      sum($"n").cast("long").as("df"),
      sum(cfOf($"tfBytes")).cast("long").as("cf"),
      max($"maxTf").as("maxTf"),
      min($"minDl").as("minDl"))
      .as[DictEntry]
  }

  /** Stages 4+5 shared by build paths: sort-merge postings into
    * self-contained compressed blocks.
    *
    * Hash-partitioned on (term, shard): a (term, shard) posting run never
    * splits across partitions, so the block decomposition is a pure
    * function of the run content — the resumable build's "incremental ≡
    * bulk" byte-equality depends on this. Head-term (Zipf) skew is handled
    * because `shard` acts as the salt: the heaviest term spreads over
    * numShards partitions (the explicit salted merge of SURVEY.md §7.1.4;
    * jvector merge analog NodeArray.merge:52-132). */
  private[graft] def encodeBlocks(spark: SparkSession, postings: Dataset[Posting],
                                  opts: Options): Dataset[Block] = {
    import spark.implicits._
    val bs = opts.blockSize
    postings
      .repartition(opts.rangePartitions, $"term", $"shard")
      .sortWithinPartitions($"term", $"shard", $"docId")
      .mapPartitions { it =>
        new BlockCutter(it, bs)
      }
  }

  /** Streaming block cutter over (term, shard, docId)-sorted postings. */
  private final class BlockCutter(it: Iterator[Posting], blockSize: Int)
      extends Iterator[Block] {
    private val buf = new scala.collection.mutable.ArrayBuffer[Posting](blockSize)
    private var pending: Posting = if (it.hasNext) it.next() else null
    override def hasNext: Boolean = pending != null
    override def next(): Block = {
      val t = pending.term; val s = pending.shard
      buf.clear()
      while (pending != null && pending.term == t && pending.shard == s &&
             buf.length < blockSize) {
        buf += pending
        pending = if (it.hasNext) it.next() else null
      }
      encodeBlock(t, s, buf.map(_.docId).toArray, buf.map(_.tf).toArray,
        buf.map(_.docLen).toArray)
    }
  }

  /** Encode one self-contained block. (maxTf, minDl) give the block-max
    * bound inputs; a (maxTf, minDl) pair dominates every posting because
    * tfPartial is monotone up in tf and down in docLen. */
  def encodeBlock(term: String, shard: Int, ids: Array[Long], tfs: Array[Int],
                  dls: Array[Int]): Block = {
    var maxTf = 0
    var minDl = Int.MaxValue
    var i = 0
    while (i < ids.length) {
      if (tfs(i) > maxTf) maxTf = tfs(i)
      if (dls(i) < minDl) minDl = dls(i)
      i += 1
    }
    Block(term, Model.bucketOf(term), shard, ids.head, ids.last, ids.length,
      Codec.encodeDocIds(ids, -1L), Codec.encodeTfs(tfs), Codec.encodeTfs(dls),
      maxTf, minDl)
  }
}
