package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Analyze, Text}
import scala.util.Random

/** Pure-kernel tests for the text-analysis operators. */
class AnalyzeSpec extends AnyFunSuite {

  test("md5 hex matches known vector") {
    assert(Analyze.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("normalize == tokens joined by single space") {
    assert(Analyze.normalize("  Hello,  World! 42 ") == "hello world 42")
    assert(Analyze.normalize("...") == "")
  }

  test("simhash: identical text -> identical hash; near text -> small hamming") {
    val base = (0 until 200).map(i => s"w${i % 37}").mkString(" ")
    val near = base + " extra token"
    val far = (0 until 200).map(i => s"v${i % 41}").mkString(" ")
    val hBase = Analyze.simhash60(base)
    assert(hBase == Analyze.simhash60(base))
    assert(Analyze.hamming60(hBase, Analyze.simhash60(near)) < 8)
    assert(Analyze.hamming60(hBase, Analyze.simhash60(far)) > 15)
    assert((hBase & ~((1L << 60) - 1)) == 0, "simhash fits in 60 bits")
  }

  test("langId: marker voting with deterministic tie-break") {
    assert(Analyze.langId("the cat sat on a mat") == "en")
    assert(Analyze.langId("der hund und die katze") == "de")
    assert(Analyze.langId("xyz abc") == "unknown")
    // tie: one marker each of de and en -> alphabetically first (de)
    assert(Analyze.langId("der the") == "de")
  }

  test("shingles5: short and regular texts") {
    assert(Analyze.shingles5("") == Set.empty)
    assert(Analyze.shingles5("ab") == Set("ab"))
    assert(Analyze.shingles5("abcdef") == Set("abcde", "bcdef"))
  }

  test("minhash: jaccard estimate within tolerance (property)") {
    val rnd = new Random(8)
    val params = Analyze.minHashParams(128)
    (0 until 20).foreach { _ =>
      val a = (0 until 300).map(_ => rnd.nextInt(1000)).toSet
      val keep = rnd.nextDouble()
      val b = a.filter(_ => rnd.nextDouble() < keep) ++
        (0 until 50).map(_ => 1000 + rnd.nextInt(200))
      val trueJ = (a & b).size.toDouble / (a | b).size
      val sa = Analyze.minHash(a.map(x => Analyze.shingleHash31(x.toString)), params)
      val sb = Analyze.minHash(b.map(x => Analyze.shingleHash31(x.toString)), params)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / params.length
      assert(math.abs(est - trueJ) < 0.17, s"est=$est true=$trueJ")
    }
  }

  test("rolling hash: deterministic, order-sensitive, normalization-invariant") {
    assert(Analyze.rollingHash("a b c") == Analyze.rollingHash("A  b,c!"))
    assert(Analyze.rollingHash("a b c") != Analyze.rollingHash("c b a"))
  }

  test("fingerprint15 is 15 lowercase hex chars, stable under renormalization") {
    val fp = Analyze.fingerprint15("Hello,   World!")
    assert(fp.length == 15 && fp.forall(c => "0123456789abcdef".contains(c)))
    assert(fp == Analyze.fingerprint15("hello world"))
  }

  test("tokenize/termFreqs consistency with Text") {
    val t = "a b a c"
    val (tfs, len) = Text.termFreqs(t)
    assert(len == Text.tokenize(t).length)
    assert(tfs.map(_._2).sum == len)
  }
}
