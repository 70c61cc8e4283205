package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Analyze, Text}

/** Frozen-behavior goldens (the reference's committed-fixture pattern:
  * jvector-tests/resources/version0.odgi asserted field-by-field in
  * TestOnDiskGraphIndex.java:196-213). The tokenizer and the analysis
  * kernels define cross-engine invariants (DuckDB oracles tokenize the
  * same way), so any change here is a format-version bump, not a refactor. */
class GoldenSpec extends AnyFunSuite {

  test("tokenizer matches committed golden sample") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/tokens_sample.txt"), "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    lines.filter(_.nonEmpty).foreach { line =>
      val Array(rawIn, expected) = line.split("\\|", -1)
      val input = rawIn.replace("\\t", "\t").replace("\\n", "\n")
      val got = Text.tokenize(input).mkString(" ")
      assert(got == expected, s"tokenizer drifted for input <$input>")
    }
  }

  test("analysis kernels match committed golden values") {
    // values captured at format v1; a change means the SQL oracles and any
    // persisted fingerprints/simhashes are invalidated
    assert(Analyze.fingerprint15("Hello,  World!") ==
      Analyze.md5Hex("hello world").substring(0, 15))
    assert(Analyze.md5Hex("hello world") == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(Analyze.simhash60("the quick brown fox") == simhashOracle("the quick brown fox"))
    assert(Analyze.rollingHash("a") == 97L)
    assert(Analyze.rollingHash("ab") == 97L * 257 + 98)
    assert(Analyze.shingleHash31("abcde") ==
      java.lang.Long.parseLong(Analyze.md5Hex("abcde").substring(0, 7), 16))
  }

  /** Independent reimplementation of the simhash spec (oracle-style). */
  private def simhashOracle(text: String): Long = {
    val (tfs, _) = Text.termFreqs(text)
    val acc = new Array[Long](60)
    tfs.foreach { case (t, w) =>
      val h = Analyze.md5Hex(t)
      (0 until 60).foreach { i =>
        val nib = Integer.parseInt(h.charAt(i / 4).toString, 16)
        val bit = (nib >> (3 - i % 4)) & 1
        acc(i) += w.toLong * (2 * bit - 1)
      }
    }
    (0 until 60).foldLeft(0L)((v, i) => if (acc(i) > 0) v | (1L << (59 - i)) else v)
  }

  test("codec golden: fixed byte layout") {
    // delta-gap varbyte layout is the on-disk format; freeze it
    val ids = Array(5L, 6L, 200L, 100000L)
    val enc = graft.core.Codec.encodeDocIds(ids, -1L)
    assert(enc.toSeq == Seq(5, 0, -63, 1, -41, -117, 6).map(_.toByte),
      s"codec layout drifted: ${enc.toSeq}")
    assert(graft.core.Codec.decodeDocIds(enc, -1L).toSeq == ids.toSeq)
  }
}
