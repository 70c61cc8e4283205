package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Nsw

/** Streaming vector ingestion — the vector twin of [[StreamingIndex]]
  * (reference B2: concurrent incremental `addGraphNode`,
  * jvector graph/GraphIndexBuilder.java:314-362, driven per micro-batch
  * instead of per thread): each `foreachBatch` routes the batch's vectors
  * to their clusters, inserts them into ONLY the touched clusters' graphs
  * (`Nsw.append`), and persists ONLY the touched cluster partitions
  * (`Nsw.saveTouched`, dynamic partition overwrite) — at the documented
  * 10^6-cluster scale a micro-batch rewrite touches a handful of
  * partition dirs, never the graph.
  *
  * Exactly-once across restarts:
  *  - the replay mark (`maxStreamBatch` in meta.json) is advanced by the
  *    same atomic meta publish that commits the batch's partitions, and
  *    batches at-or-under the mark are skipped on replay;
  *  - a crash BETWEEN the adj write and the meta publish is healed by
  *    idempotence, not bookkeeping: `Nsw.append` skips keys already
  *    present in a cluster, so the replayed batch rebuilds byte-identical
  *    partitions and then advances the mark.
  * The checkpoint dir is the stream identity (same contract as
  * StreamingIndex): resuming with the same checkpoint continues the
  * batchId sequence the mark was written against.
  *
  * The coarse router (centroids) stays FIXED across appends — the same
  * stable-router contract as `Nsw.append`; re-clustering is a rebuild.
  * Fused PQ codes, if present, are dropped by the first append (new nodes
  * have none) — re-attach offline with `Nsw.attachPqWith`. */
object StreamingNsw {

  def start(spark: SparkSession, vectors: DataFrame, keyCol: String,
            vecCol: String, dir: String, checkpoint: String): StreamingQuery = {
    // resident graph: loaded once, replaced after each committed batch
    @volatile var graph = Nsw.load(spark, dir)
    @volatile var mark = Nsw.loadStreamBatch(spark, dir)
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > mark) {
          val s = batch.sparkSession
          // ONE routing pass: append routes the batch to clusters anyway
          // and returns the touched set (appendTouched) — the old second
          // pass here also skipped append's float cast, so an
          // array<double> stream failed analysis on its first batch
          val (next, touched) = Nsw.appendTouched(s, graph, batch, keyCol, vecCol)
          Nsw.saveTouched(s, next, dir, touched, maxStreamBatch = batchId)
          if (next ne graph) {
            graph.unpersist() // no-op: appendTouched already released it
            // each append stacks a DAG on its parent; re-anchor the
            // resident lineage on the just-persisted parquet periodically
            // so a long-lived stream can't grow an unbounded plan
            graph = if (batchId % 16 == 15) {
              next.unpersist()
              val g = Nsw.load(s, dir)
              Nsw.Graph(g.adj.persist(), g.centroids, g.params,
                clusterLocal = false, deleted = g.deleted, pq = g.pq)
            } else next
          } // else: empty batch — nothing appended, the mark still advances
          mark = batchId
        }
      }
      .start()
  }
}
