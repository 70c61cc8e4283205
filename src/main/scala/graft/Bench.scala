package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus
import graft.index._

/** Driver-run benchmark: ONE JSON line with
  *  - per-gate-query seconds at SPARK_GRAFT_SF_DIR (local[cpus]),
  *  - warm BM25 top-10 latency over the built index,
  *  - index-build throughput on the seeded synthetic corpus at TWO
  *    parallelism levels (local[8] vs local[32]) on identical input +
  *    scaling efficiency = (thr32/thr8)/4 — the sandbox proxy for the
  *    north rule's N-vs-4N-executor criterion (BASELINE.md; the reference
  *    evidences its own claim the same single-machine way, jvector
  *    README.md:11 "linear to at least 32 threads").
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def timeS[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "60000").toLong

    // ---- phase 1: gate queries on sfDir ----
    val spark = session(cpus)
    Gate.index(spark, sfDir) // build once so per-query times are honest
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = timeS {
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      }
      name -> t
    }
    // warm query latency: median of 7 searches on the built index
    val ix = Gate.index(spark, sfDir)
    val lat = (0 until 7).map(i => timeS {
      ix.search(Gate.Queries(i % Gate.Queries.size)._2, 10).collect()
    }).sorted
    val warmMs = lat(lat.size / 2) * 1000
    spark.stop()

    // ---- phase 2: build-throughput scaling, identical input ----
    def buildThroughput(p: Int): (Double, Double) = {
      val s = session(p)
      // JIT/classload warmup so the first (low-parallelism) run isn't penalized
      val warmDir = java.nio.file.Files.createTempDirectory(s"graft-warm$p").toString
      ResumableBuild.build(s, WebCorpus.generate(s, 4000, partitions = 64), warmDir,
        IndexBuilder.Options(numShards = 32, rangePartitions = 64), numChunks = 4)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-bench$p").toString
      val corpus = WebCorpus.generate(s, scaleDocs, partitions = 64)
      val secs = timeS {
        ResumableBuild.build(s, corpus, dir,
          IndexBuilder.Options(numShards = 32, rangePartitions = 64), numChunks = 8)
      }
      val manifest = ResumableBuild.readManifest(s, dir)
      val chunkSecs = manifest.map(_.elapsedMs).sum / 1000.0
      s.stop()
      (scaleDocs / secs, scaleDocs / chunkSecs)
    }
    val (thr8, chunk8) = buildThroughput(8)
    val (thr32, chunk32) = buildThroughput(32)
    val eff = (thr32 / thr8) / 4.0

    val total = queryTimes.map(_._2).sum
    val qs = queryTimes.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","""
        + f""""warm_query_ms":$warmMs%.1f,"""
        + f""""build":{"docs":$scaleDocs,"throughput_docs_per_sec":{"local8":$thr8%.0f,"local32":$thr32%.0f},"""
        + f""""chunk_phase_docs_per_sec":{"local8":$chunk8%.0f,"local32":$chunk32%.0f},"""
        + f""""scaling_efficiency":$eff%.3f}}""")
  }
}
