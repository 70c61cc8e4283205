package graft

import graft.corpus.WebCorpus

/** Materialize the seeded synthetic corpus as a parquet table — the
  * benchmark's input-preparation step (the corpus is a table at rest per
  * the input_hint; builds scan it, they don't regenerate it). */
object CorpusGen {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val out = args(1)
    val parts = if (args.length > 2) args(2).toInt else 128
    val spark = IndexCli.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    WebCorpus.generate(spark, n, partitions = parts)
      .write.mode("overwrite").parquet(out)
    println(s"wrote $n docs to $out")
    spark.stop()
  }
}
