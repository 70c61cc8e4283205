package graft

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, ResumableBuild}

/** One pinned build, spawned by Bench as a separate JVM per parallelism
  * level (so task slots, GC threads and memory are all bounded by the
  * taskset mask — the faithful single-machine proxy for an N-executor
  * cluster). Prints one JSON line with the build seconds. */
object BenchBuildOne {
  def main(args: Array[String]): Unit = {
    val Array(corpusPath, indexDir, chunks, parChunks) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-build-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // v2 committer: task output moves to the destination at task commit,
      // removing the serial per-file job-commit rename tail that the
      // phase-timing probe showed pinning one core at 32-way parallelism.
      // Safe here: chunk dirs are overwrite-mode and only become visible
      // via the catalog snapshot commit, so a failed job's partials are
      // cleared by the rerun's overwrite and never read.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(corpusPath)
    // Warm the session OUTSIDE the timed window: JIT/codegen, executor
    // task-launch path and shuffle machinery all pay a first-use cost that
    // is cluster spin-up, not indexing work — a real N-executor cluster's
    // throughput is measured against a warm cluster, and this fixed cost
    // is identical at every parallelism level (a pure additive bias to the
    // N vs 4N ratio). Does NOT touch the corpus: no page-cache or
    // footer-prefetch advantage enters the measurement.
    locally {
      import spark.implicits._
      spark.range(100000).map(_ + 1).repartition(8).groupBy($"value" % 7)
        .count().collect()
    }
    val t0 = System.nanoTime()
    val ix = ResumableBuild.build(spark, corpus, indexDir,
      IndexBuilder.Options(numShards = 32, rangePartitions = 128),
      numChunks = chunks.toInt, assumeSorted = true,
      parallelChunks = parChunks.toInt)
    val secs = (System.nanoTime() - t0) / 1e9
    // per-phase wall seconds (chunk phases overlap under parallelChunks,
    // so they sum past the total — each is its own wall window): the
    // structured evidence that lets a BENCH reader separate host noise
    // (total spikes, phases flat) from serial fraction (one phase
    // growing with the level)
    import scala.jdk.CollectionConverters._
    val phases = ResumableBuild.lastPhaseSecs.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(f"""{"buildSecs":$secs%.2f,"docs":${ix.stats.numDocs},"phases":$phases}""")
    spark.stop()
  }
}
