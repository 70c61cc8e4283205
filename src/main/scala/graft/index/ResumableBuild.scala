package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Text

/** Checkpointed, resumable index build (jvector's incremental on-disk
  * write + resume: OnDiskGraphIndexWriter.writeInline:62-84 and
  * GraphIndexBuilder.load:684-706, with the metamorphic guarantee
  * "incremental ≡ bulk" of TestOnDiskGraphIndex.java:215-262).
  *
  * The corpus is cut into `numChunks` groups of input range-partitions —
  * each chunk is a contiguous docId range, so its compressed blocks are
  * globally valid as-is (blocks are self-contained docId runs; a
  * (term, shard) posting list is just its blocks ordered by firstDocId,
  * regardless of which chunk wrote them — the same reason jvector can
  * write node payloads out of order at precomputed offsets).
  *
  * Per chunk: one Spark job → parquet segment dir `blocks/chunk=c` +
  * one manifest JSON with lineage + metrics (rows, postings, blocks,
  * bytes, ms, docs/sec). Restart skips chunks whose manifest row exists
  * and whose segment dir committed (_SUCCESS). Dictionary + stats are
  * recomputed from the union of segments at finalize, so a resumed build
  * is segment-identical AND dictionary-identical to a one-shot build.
  */
object ResumableBuild {

  /** @param failAfterChunks test hook: throw after k chunks committed
    *   (the kill-and-resume metamorphic test's injection point). */
  def build(spark: SparkSession, webpages: DataFrame, dir: String,
            opts: IndexBuilder.Options = IndexBuilder.Options(),
            numChunks: Int = 8,
            failAfterChunks: Option[Int] = None): InvertedIndex = {
    import spark.implicits._
    val fs = FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val in = IndexBuilder.normalize(spark, webpages).as[(String, String, String)]

    // stage 1 (always recomputed — deterministic given the input): global
    // sort + per-partition counts -> dense docId offsets
    val parts = opts.rangePartitions
    val sorted = in.repartitionByRange(parts, $"url").sortWithinPartitions($"url")
      .persist()
    val counts = sorted.mapPartitions { it =>
      Iterator((TaskContext.getPartitionId(), it.size.toLong))
    }.collect().toMap
    val offsets = new Array[Long](parts + 1)
    (0 until parts).foreach(p => offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L))
    val numDocs = offsets(parts)
    val nShards = opts.numShards
    val offB = spark.sparkContext.broadcast(offsets)
    def shardOf(docId: Long): Int =
      if (numDocs == 0) 0 else math.min(nShards - 1, (docId * nShards / numDocs).toInt)

    // docs + stats (cheap; idempotent overwrite)
    val docs = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = offB.value(pid)
      it.map { case (url, text, lang) =>
        val d = DocMeta(i, shardOf(i), url, Text.tokenize(text).length, lang); i += 1; d
      }
    }.persist()
    val totTok = if (numDocs == 0) 0L else docs.agg(sum($"docLen")).as[Long].head()
    val avgdl = if (numDocs == 0) 0.0 else totTok.toDouble / numDocs
    val stats = IndexStats(numDocs, totTok, avgdl, nShards)
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    Seq(stats).toDS().write.mode("overwrite").json(s"$dir/stats")

    // chunk c = a group of whole shards (contiguous docId range). Chunks
    // align to shard boundaries so a (term, shard) posting run is never
    // split across chunks — with the hash-partitioned block encoder this
    // makes the chunked block layout byte-identical to the one-shot one.
    def chunkOfShard(s: Int): Int = s * numChunks / nShards
    // shard s starts at the smallest docId with docId*nShards/numDocs == s
    def shardLoDoc(s: Int): Long =
      if (s >= nShards) numDocs else (s.toLong * numDocs + nShards - 1) / nShards
    def chunkDocRange(c: Int): (Long, Long) = {
      val ss = (0 until nShards).filter(chunkOfShard(_) == c)
      if (ss.isEmpty) (0L, 0L) else (shardLoDoc(ss.min), shardLoDoc(ss.max + 1))
    }
    val chunks = (0 until numChunks).filter(c => (0 until nShards).exists(chunkOfShard(_) == c))

    var doneCount = 0
    chunks.foreach { c =>
      val segDir = new Path(s"$dir/blocks/chunk=$c")
      val maniPath = new Path(s"$dir/manifest/chunk-$c.json")
      val committed = fs.exists(maniPath) && fs.exists(new Path(segDir, "_SUCCESS"))
      val (dLo, dHi) = chunkDocRange(c)
      if (!committed) {
        val t0 = System.nanoTime()
        // positional filter on the chunk's docId range; rows outside it
        // are skipped BEFORE tokenization (cheap row skip). At cluster
        // scale the corpus would be a sorted table and this filter prunes
        // whole files by url range; the docId math is identical.
        val postings = sorted.mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          var i = offB.value(pid)
          it.flatMap { case (_, text, _) =>
            val docId = i; i += 1
            if (docId < dLo || docId >= dHi) Iterator.empty
            else {
              val (tfs, len) = Text.termFreqs(text)
              tfs.iterator.map { case (t, tf) =>
                Posting(t, shardOf(docId), docId, tf, len)
              }
            }
          }
        }
        val blocks = IndexBuilder.encodeBlocks(spark, postings, opts).persist()
        val (nBlocks, nPostings) = blocks.agg(count(lit(1)), sum($"n"))
          .as[(Long, Option[Long])].head() match { case (b, p) => (b, p.getOrElse(0L)) }
        blocks.write.mode("overwrite").parquet(segDir.toString)
        blocks.unpersist()
        val ms = (System.nanoTime() - t0) / 1000000
        val chunkDocs = dHi - dLo
        val bytes = fs.getContentSummary(segDir).getLength
        val row = ManifestRow(c, "done", chunkDocs, nPostings, nBlocks, bytes, ms,
          if (ms == 0) 0.0 else chunkDocs * 1000.0 / ms)
        writeManifest(fs, maniPath, row)
      }
      doneCount += 1
      failAfterChunks.foreach { k =>
        if (doneCount >= k && doneCount < chunks.size)
          throw new RuntimeException(s"injected failure after $doneCount chunks")
      }
    }

    // finalize: dict + format stamp from the union of segments
    val blocks = readBlocks(spark, dir).persist()
    val dict = IndexBuilder.dictFromBlocks(spark, blocks).persist()
    dict.write.mode("overwrite").parquet(s"$dir/dict")
    Seq(("graft-index", IndexBuilder.FormatVersion)).toDF("magic", "version")
      .write.mode("overwrite").json(s"$dir/format")
    sorted.unpersist()
    InvertedIndex(spark, docs, blocks, dict, stats)
  }

  def readBlocks(spark: SparkSession, dir: String): Dataset[Block] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/blocks").select(
      "term", "bucket", "shard", "firstDocId", "lastDocId", "n",
      "docBytes", "tfBytes", "dlBytes", "maxTf", "minDl").as[Block]
  }

  def readManifest(spark: SparkSession, dir: String): Seq[ManifestRow] = {
    val fs = FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new Path(s"$dir/manifest")
    if (!fs.exists(p)) return Seq.empty
    import spark.implicits._
    val files = fs.listStatus(p).map(_.getPath.toString).filter(_.endsWith(".json"))
    if (files.isEmpty) Seq.empty
    else spark.read.json(files.toIndexedSeq: _*)
      .selectExpr("cast(chunk as int) chunk", "status", "cast(docs as long) docs",
        "cast(postings as long) postings", "cast(blocks as long) blocks",
        "cast(bytes as long) bytes", "cast(elapsedMs as long) elapsedMs",
        "cast(docsPerSec as double) docsPerSec")
      .as[ManifestRow].collect().toSeq.sortBy(_.chunk)
  }

  private def writeManifest(fs: FileSystem, path: Path, row: ManifestRow): Unit = {
    val json =
      s"""{"chunk":${row.chunk},"status":"${row.status}","docs":${row.docs},""" +
      s""""postings":${row.postings},"blocks":${row.blocks},"bytes":${row.bytes},""" +
      s""""elapsedMs":${row.elapsedMs},"docsPerSec":${row.docsPerSec}}"""
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8"))
    out.close()
    fs.rename(tmp, path) // atomic commit of the chunk's lineage row
  }
}
