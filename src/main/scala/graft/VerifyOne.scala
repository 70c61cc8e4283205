package graft
import org.apache.spark.sql.SparkSession

/** Run a single gate query by name (builder-side iteration helper). */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.show(20, false)
    println("rows: " + df.count())
    spark.stop()
  }
}
