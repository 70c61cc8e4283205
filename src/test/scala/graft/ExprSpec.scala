package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.{CosineSim, DotProd, L2Dist, VectorFunctions}

/** The native vector kernels (graft.functions.VectorExprs) must be
  * bit-identical to the higher-order-function plans they replaced —
  * the dedup/ANN oracles hash quantized doubles, so accumulation order
  * is load-bearing. Covers BOTH execution paths: whole-stage codegen
  * (DataFrame) and interpreted eval (direct Expression.eval, the path
  * Spark falls back to when codegen is disabled or fails).
  */
class ExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-expr-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def hofL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  test("codegen kernels are bit-identical to the HOF formulation (200 random pairs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val d = 1 + rnd.nextInt(64)
      (i.toLong, Seq.fill(d)(rnd.nextGaussian()), Seq.fill(d)(rnd.nextGaussian() * 1e3))
    }
    val df = rows.toDF("id", "va", "vb")
    val got = df.select($"id",
        VectorFunctions.cosineSim($"va", $"vb").as("c"),
        VectorFunctions.dotProd($"va", $"vb").as("d"),
        VectorFunctions.l2Dist($"va", $"vb").as("l"),
        hofCosine($"va", $"vb").as("hc"),
        hofDot($"va", $"vb").as("hd"),
        hofL2($"va", $"vb").as("hl"))
      .collect()
    got.foreach { r =>
      // == on doubles: bit-identical (same accumulation order), not approx
      assert(r.getDouble(1) == r.getDouble(4), s"cosine mismatch id=${r.getLong(0)}")
      assert(r.getDouble(2) == r.getDouble(5), s"dot mismatch id=${r.getLong(0)}")
      assert(r.getDouble(3) == r.getDouble(6), s"l2 mismatch id=${r.getLong(0)}")
    }
  }

  test("interpreted eval matches codegen result and null semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def lit(xs: Seq[java.lang.Double]) =
      Literal.create(ArrayData.toArrayData(
        xs.map(x => if (x == null) null else x.doubleValue: Any).toArray),
        ArrayType(DoubleType))
    val a = Seq[java.lang.Double](1.0, 2.0, 3.0)
    val b = Seq[java.lang.Double](4.0, -5.0, 6.0)
    assert(CosineSim(lit(a), lit(b)).eval(null) ==
      (1.0 * 4 + 2.0 * -5 + 3.0 * 6) /
        (math.sqrt(1 + 4 + 9) * math.sqrt(16 + 25 + 36)))
    assert(DotProd(lit(a), lit(b)).eval(null) == 12.0)
    assert(L2Dist(lit(a), lit(b)).eval(null) ==
      math.sqrt(9.0 + 49.0 + 9.0))
    // mismatched lengths -> null (zip_with pads with null in the HOF form)
    assert(DotProd(lit(a), lit(b.take(2))).eval(null) == null)
    // null element -> null
    assert(CosineSim(lit(a), lit(Seq[java.lang.Double](1.0, null, 2.0))).eval(null) == null)
  }

  test("embedCosinePairs equals brute force with the native kernel (fp-exact)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // two tight clusters + noise, 24-dim
    def vec(center: Double) = Seq.fill(24)((center + rnd.nextGaussian() * 0.05).toFloat)
    val emb = ((0L until 60L).map(i => (i, vec(1.0))) ++
               (60L until 120L).map(i => (i, vec(-1.0))) ++
               (120L until 150L).map(i => (i, Seq.fill(24)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val got = ops.Dedup.embedCosinePairs(emb, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val want = ops.Dedup.embedCosinePairsBrute(emb, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }
}
