package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus

/** Write the seeded synthetic bench corpus to parquet (a table at rest,
  * per input_hint) — the shared input for builder-side A/B build probes.
  * Usage: GenCorpus <outPath> [docs] [partitions]. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val docs = if (args.length > 1) args(1).toLong else 1080000L
    val parts = if (args.length > 2) args(2).toInt else 128
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-gen-corpus")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    WebCorpus.generate(spark, docs, partitions = parts)
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
