package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.Text
import graft.index._

/** Incremental index ingestion via Structured Streaming — the engine's
  * analog of jvector's concurrent incremental insert + OPTIMIZE
  * (GraphIndexBuilder.addGraphNode:314-362, IPCService OPTIMIZE:215-230),
  * re-expressed as the idiomatic Spark pattern from SURVEY.md §2.1 B2:
  * `writeStream.foreachBatch` appends micro-segments; `refresh` is the
  * OPTIMIZE step that recomputes dictionary + stats; full compaction
  * (InvertedIndex.compact / a rebuild) merges micro-segments away.
  *
  * Each micro-batch becomes its own shard id (opts.numShards + batchId),
  * so its (term, shard) posting runs are self-contained and globally
  * valid next to the bulk segments — no rewrite of existing data, exactly
  * like jvector's out-of-order inline node writes. Because block-max
  * metadata is integer (maxTf, minDl), the avgdl drift caused by appends
  * never invalidates stored segments (see Model.Block).
  */
object StreamingIndex {

  /** Start ingesting a streaming DataFrame of pages (url, text, lang)
    * into the index at `dir`. Exactly-once per batch via the streaming
    * checkpoint + idempotent chunk dirs. */
  def start(pages: DataFrame, dir: String, checkpoint: String,
            opts: IndexBuilder.Options = IndexBuilder.Options()): StreamingQuery =
    pages.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch.sparkSession, batch, dir, opts, batchId)
      }
      .start()

  /** Append one micro-batch as a micro-segment chunk. Idempotent: if the
    * chunk dir already committed (replayed batch after restart), skip. */
  def appendBatch(spark: SparkSession, batch: DataFrame, dir: String,
                  opts: IndexBuilder.Options, batchId: Long): Unit = {
    import spark.implicits._
    if (batch.isEmpty) return
    val fs = FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val chunkId = 100000 + batchId.toInt // micro-segment chunk namespace
    val segDir = new Path(s"$dir/blocks/chunk=$chunkId")
    val maniPath = new Path(s"$dir/manifest/chunk-$chunkId.json")
    if (fs.exists(maniPath) && fs.exists(new Path(segDir, "_SUCCESS"))) return

    val t0 = System.nanoTime()
    val prev = spark.read.json(s"$dir/stats")
      .selectExpr("cast(numDocs as long)", "cast(totalTokens as long)",
        "cast(avgdl as double)", "cast(numShards as int)")
      .as[(Long, Long, Double, Int)].head()
    val (baseDocs, baseTokens, _, baseShards) = prev
    val shard = baseShards + batchId.toInt // one shard per micro-batch

    val in = IndexBuilder.normalize(spark, batch).as[(String, String, String)]
    val parts = math.max(1, math.min(opts.rangePartitions, 8))
    val sorted = in.repartitionByRange(parts, $"url").sortWithinPartitions($"url").persist()
    val counts = sorted.mapPartitions { it =>
      Iterator((TaskContext.getPartitionId(), it.size.toLong))
    }.collect().toMap
    val offsets = new Array[Long](parts + 1)
    (0 until parts).foreach(p => offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L))
    val offB = spark.sparkContext.broadcast(offsets)

    val docs = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = baseDocs + offB.value(pid)
      it.map { case (url, text, lang) =>
        val d = DocMeta(i, shard, url, Text.countTokens(text), lang); i += 1; d
      }
    }.persist()
    val batchTokens = docs.agg(sum($"docLen")).as[Long].head()
    docs.write.mode("append").parquet(s"$dir/docs")

    val postings = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = baseDocs + offB.value(pid)
      it.flatMap { case (_, text, _) =>
        val docId = i; i += 1
        val (tfs, len) = Text.termFreqs(text)
        tfs.iterator.map { case (t, tf) => Posting(t, shard, docId, tf, len) }
      }
    }
    val blocks = IndexBuilder.encodeBlocks(spark, postings, opts).persist()
    val (nBlocks, nPostings) = blocks.agg(count(lit(1)), coalesce(sum($"n"), lit(0L)))
      .as[(Long, Long)].head()
    blocks.write.mode("overwrite").parquet(segDir.toString)
    blocks.unpersist()

    val batchDocs = offsets(parts)
    docs.unpersist()
    val newDocs = baseDocs + batchDocs
    val newTokens = baseTokens + batchTokens
    Seq(IndexStats(newDocs, newTokens,
      if (newDocs == 0) 0.0 else newTokens.toDouble / newDocs, baseShards))
      .toDS().write.mode("overwrite").json(s"$dir/stats")

    val ms = (System.nanoTime() - t0) / 1000000
    val json =
      s"""{"chunk":$chunkId,"status":"done","docs":$batchDocs,"postings":$nPostings,""" +
      s""""blocks":$nBlocks,"bytes":${fs.getContentSummary(segDir).getLength},""" +
      s""""elapsedMs":$ms,"docsPerSec":${if (ms == 0) 0.0 else batchDocs * 1000.0 / ms}}"""
    val tmp = new Path(maniPath.getParent, maniPath.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8")); out.close()
    fs.rename(tmp, maniPath)
    sorted.unpersist()
    // invalidate the session's cached file listing of the PARTITIONED
    // roots: the new chunk=/docs files are invisible to readers that
    // listed these dirs before this batch (Spark only auto-refreshes the
    // exact path it wrote, not the partitioned parent)
    spark.catalog.refreshByPath(s"$dir/blocks")
    spark.catalog.refreshByPath(s"$dir/docs")
    spark.catalog.refreshByPath(s"$dir/stats")
  }

  /** OPTIMIZE: recompute dictionary from the union of bulk + micro
    * segments (df/cf/bounds must reflect appended docs before querying). */
  def refresh(spark: SparkSession, dir: String): InvertedIndex = {
    Seq("blocks", "docs", "stats", "dict").foreach(p =>
      spark.catalog.refreshByPath(s"$dir/$p"))
    val blocks = ResumableBuild.readBlocks(spark, dir)
    val dict = IndexBuilder.dictFromBlocks(spark, blocks)
    dict.write.mode("overwrite").parquet(s"$dir/dict")
    InvertedIndex.load(spark, dir)
  }
}
