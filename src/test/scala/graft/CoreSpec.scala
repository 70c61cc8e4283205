package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import scala.util.Random

/** Property tests for the pure-Scala kernels, modeled on the reference's
  * randomized per-operator unit tests (jvector TestLongHeap / NodeArray
  * randomized suites; seeded like their LuceneTestCase.getRandom()). */
class CoreSpec extends AnyFunSuite {

  def forAllSeeded(iters: Int = 200)(body: Random => Unit): Unit = {
    val rnd = new Random(42)
    (0 until iters).foreach(_ => body(rnd))
  }

  test("termFreqs fast ASCII path == tokenize-derived frequencies (property)") {
    val pool = "abzAZ09 .,-_!?\t\n#@" // mixed case/digits/separators
    forAllSeeded(500) { rnd =>
      val s = Array.fill(rnd.nextInt(400))(pool(rnd.nextInt(pool.length))).mkString
      val (tf, len) = Text.termFreqs(s)
      val toks = Text.tokenize(s)
      assert(len == toks.length, s"len mismatch for <$s>")
      val want = toks.groupBy(identity).view.mapValues(_.length).toMap
      assert(tf.toMap == want, s"tf mismatch for <$s>")
      assert(tf.map(_._1).toSeq == tf.map(_._1).toSeq.sorted) // term-asc order
    }
    // non-ASCII falls back to the frozen tokenizer (same results)
    Seq("héllo wörld foo", "ascii then ünïcode", "日本語 text 42", "İstanbul I") // scalastyle:ignore
      .foreach { s =>
        val (tf, len) = Text.termFreqs(s)
        val toks = Text.tokenize(s)
        assert(len == toks.length && tf.toMap ==
          toks.groupBy(identity).view.mapValues(_.length).toMap, s"<$s>")
      }
    // very long single token exercises buffer growth
    val long = "x" * 5000 + " y"
    assert(Text.termFreqs(long)._1.toMap == Map(("x" * 5000) -> 1, "y" -> 1))
  }

  test("tokenizeInto streaming sink == frozen tokenize (property)") {
    val pool = "abzAZ09 .,-_!?\t\n#@"
    def drain(s: String): Option[Seq[String]] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[String]
      val n = Text.tokenizeInto(s, (buf, len) => got += new String(buf, 0, len))
      if (n < 0) None else { assert(n == got.length); Some(got.toSeq) }
    }
    forAllSeeded(500) { rnd =>
      val s = Array.fill(rnd.nextInt(400))(pool(rnd.nextInt(pool.length))).mkString
      assert(drain(s).contains(Text.tokenize(s).toSeq), s"<$s>")
    }
    // non-ASCII: must return -1 WITHOUT emitting any token (atomic fallback)
    Seq("héllo wörld", "ascii then ünïcode", "日本語 42").foreach { s =>
      var called = false
      assert(Text.tokenizeInto(s, (_, _) => called = true) == -1 && !called, s"<$s>")
    }
    assert(drain("x" * 5000 + " Y9").contains(Seq("x" * 5000, "y9"))) // buffer growth
  }

  test("codec: docId delta-varbyte round-trips (property)") {
    forAllSeeded() { rnd =>
      val n = rnd.nextInt(300)
      val ids = Array.fill(n)(rnd.nextLong(1L << 40)).distinct.sorted
      val enc = Codec.encodeDocIds(ids, -1L)
      assert(Codec.decodeDocIds(enc, -1L).toSeq == ids.toSeq)
    }
  }

  test("codec: tf varbyte round-trips (property)") {
    forAllSeeded() { rnd =>
      val tfs = Array.fill(rnd.nextInt(300))(1 + rnd.nextInt(1 << 20))
      assert(Codec.decodeTfs(Codec.encodeTfs(tfs)).toSeq == tfs.toSeq)
    }
  }

  test("codec: consecutive ids cost ~1 byte each") {
    val ids = (1000L until 2000L).toArray
    val enc = Codec.encodeDocIds(ids, 999L)
    assert(enc.length == ids.length)
  }

  test("codec: rejects non-increasing ids") {
    intercept[IllegalArgumentException] {
      Codec.encodeDocIds(Array(5L, 5L), -1L)
    }
  }

  test("topk: matches sort-based oracle incl. tie-break (property)") {
    forAllSeeded() { rnd =>
      val k = 1 + rnd.nextInt(20)
      // few distinct scores to force score ties -> exercises docId tie-break
      val xs = List.fill(rnd.nextInt(200))(
        (rnd.nextInt(8).toFloat, rnd.nextInt(1000))).distinct
      val heap = new TopK(k)
      xs.foreach { case (s, d) => heap.offer(s, d) }
      val got = heap.drain().toSeq
      val oracle = xs.sortBy { case (s, d) => (-s, d) }.take(k)
      assert(got == oracle, s"k=$k xs=$xs")
    }
  }

  test("topk: threshold is kth best once full") {
    val h = new TopK(3)
    Seq(1f, 5f, 3f, 4f, 2f).zipWithIndex.foreach { case (s, i) => h.offer(s, i) }
    assert(h.threshold == 3f)
    assert(h.drain().toSeq == Seq((5f, 1), (4f, 3), (3f, 2)))
  }

  test("topk: wouldAccept consistent with offer") {
    forAllSeeded(50) { rnd =>
      val h = new TopK(5)
      (0 until 50).foreach { _ =>
        val s = rnd.nextInt(4).toFloat; val d = rnd.nextInt(100)
        val predicted = h.wouldAccept(s, d)
        assert(h.offer(s, d) == predicted)
      }
    }
  }

  test("tokenizer: frozen golden cases") {
    assert(Text.tokenize("Hello, World!").toSeq == Seq("hello", "world"))
    assert(Text.tokenize("a  b\tc\nd").toSeq == Seq("a", "b", "c", "d"))
    assert(Text.tokenize("x1 2y Z9").toSeq == Seq("x1", "2y", "z9"))
    assert(Text.tokenize("...").toSeq == Seq())
    assert(Text.tokenize("").toSeq == Seq())
    assert(Text.tokenize("naïve café 北京").toSeq == Seq("na", "ve", "caf"))
  }

  test("termFreqs: counts and docLen") {
    val (tfs, len) = Text.termFreqs("a b a c b a")
    assert(len == 6)
    assert(tfs.toSeq == Seq(("a", 3), ("b", 2), ("c", 1)))
  }

  test("extractor: frozen golden cases") {
    assert(Text.extract("<html><body>hi <b>there</b></body></html>") == "hi there")
    assert(Text.extract("a &amp; b &lt;c&gt;") == "a & b <c>")
    assert(Text.extract("  <p>x</p>\n<p>y</p> ") == "x y")
  }

  test("bm25: known value and monotonicity (property)") {
    val s = Text.score(tf = 2, docLen = 100, df = 10, n = 1000, avgdl = 100.0)
    val idf = math.log(1.0 + (1000 - 10 + 0.5) / 10.5)
    val tfp = 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75))
    assert(math.abs(s - idf * tfp) < 1e-12)
    forAllSeeded() { rnd =>
      val tf = 1 + rnd.nextInt(100)
      val n = 10000L
      val df = 1L + rnd.nextInt(9999)
      assert(Text.score(tf + 1, 100, df, n, 100.0) > Text.score(tf, 100, df, n, 100.0))
      assert(Text.score(tf, 100, df, n, 100.0) >= Text.score(tf, 100, df.min(n - 50) + 50, n, 100.0))
    }
  }
}
