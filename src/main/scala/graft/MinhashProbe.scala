package graft
import org.apache.spark.sql.SparkSession

/** Warm-timing probe for the dedup gate queries (round-5 kernel work:
  * in-row minhash signatures + packed-set verification). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
    Seq("dedup_minhash" -> GateOps.dedupMinhash _,
        "dedup_jaccard" -> GateOps.dedupJaccard _).foreach { case (name, fn) =>
      val t0c = System.nanoTime()
      val n0 = fn(spark, sf).count()
      println(f"$name cold: ${(System.nanoTime()-t0c)/1e9}%.2f s rows=$n0")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sf).count()
        println(f"$name run $i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
