package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.TimeLimits
import org.scalatest.time.{Span, Seconds}
import graft.core.Text
import graft.index.{Block, IndexBuilder, ScoredDoc, Wand}
import scala.util.Random

/** Randomized equivalence: Block-Max WAND vs naive exact scoring, pure
  * Scala (no Spark) — the fast inner loop of the rank-identity guarantee.
  * Pattern: jvector's randomized per-operator tests (TestVectorGraph). */
class WandSpec extends AnyFunSuite with TimeLimits {

  /** Build per-term blocks + a naive score map from a random corpus. */
  def makeCorpus(rnd: Random, nDocs: Int, vocab: Int):
      (Seq[(Double, Double, Array[Block])], Map[Long, Double], Double) = {
    val docs = (0 until nDocs).map { _ =>
      val len = 1 + rnd.nextInt(30)
      Array.fill(len)(s"w${rnd.nextInt(vocab)}")
    }
    val avgdl = docs.map(_.length).sum.toDouble / nDocs
    val n = nDocs.toLong
    // postings per term
    val byTerm = scala.collection.mutable.Map[String, Vector[(Long, Int, Int)]]()
    docs.zipWithIndex.foreach { case (toks, d) =>
      toks.groupBy(identity).foreach { case (t, occ) =>
        byTerm(t) = byTerm.getOrElse(t, Vector.empty) :+ ((d.toLong, occ.length, toks.length))
      }
    }
    val queryTerms = (0 until 3).map(_ => s"w${rnd.nextInt(vocab)}").distinct
      .filter(byTerm.contains)
    val termBlocks = queryTerms.map { t =>
      val ps = byTerm(t).sortBy(_._1)
      val idf = Text.idf(ps.length.toLong, n)
      // small block size to exercise multi-block skipping
      val blocks = ps.grouped(4).map { g =>
        IndexBuilder.encodeBlock(t, 0, g.map(_._1).toArray, g.map(_._2).toArray,
          g.map(_._3).toArray)
      }.toArray
      val ub = idf * blocks.map(b => Text.tfPartial(b.maxTf, b.minDl.toLong, avgdl)).max
      (idf, ub, blocks)
    }
    // naive exact scores
    val naive = scala.collection.mutable.Map[Long, Double]()
    queryTerms.foreach { t =>
      val idf = Text.idf(byTerm(t).length.toLong, n)
      byTerm(t).foreach { case (d, tf, dl) =>
        naive(d) = naive.getOrElse(d, 0.0) + idf * Text.tfPartial(tf, dl, avgdl)
      }
    }
    (termBlocks, naive.toMap, avgdl)
  }

  test("wand topK == naive exact topK (500 random corpora)") {
    failAfter(Span(120, Seconds)) {
      val rnd = new Random(1234)
      (0 until 500).foreach { iter =>
        val (termBlocks, naive, avgdl) = makeCorpus(rnd, 20 + rnd.nextInt(300), 2 + rnd.nextInt(30))
        val k = 1 + rnd.nextInt(15)
        val got = Wand.topK(termBlocks, k, avgdl).toSeq
        val want = naive.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
          .map { case (d, s) => ScoredDoc(d, s) }
        assert(got.map(_.docId) == want.map(_.docId), s"iter=$iter k=$k")
        got.zip(want).foreach { case (g, w) =>
          assert(math.abs(g.score - w.score) < 1e-12, s"iter=$iter")
        }
      }
    }
  }

  test("wand threshold == naive filter (200 random corpora)") {
    failAfter(Span(60, Seconds)) {
      val rnd = new Random(99)
      (0 until 200).foreach { iter =>
        val (termBlocks, naive, avgdl) = makeCorpus(rnd, 20 + rnd.nextInt(200), 2 + rnd.nextInt(20))
        val tau = 0.2 + rnd.nextDouble() * 2
        val got = Wand.threshold(termBlocks, tau, avgdl).toSeq.sortBy(_.docId)
        val want = naive.toSeq.filter(_._2 >= tau).sortBy(_._1)
          .map { case (d, s) => ScoredDoc(d, s) }
        assert(got.map(_.docId) == want.map(_.docId), s"iter=$iter tau=$tau")
      }
    }
  }

  test("wand with filter excludes denied docs") {
    val rnd = new Random(5)
    val (termBlocks, naive, avgdl) = makeCorpus(rnd, 200, 5)
    val deny = new java.util.HashSet[java.lang.Long]()
    naive.keys.filter(_ % 3 == 0).foreach(d => deny.add(d))
    val f = new Wand.DocFilter(true, new java.util.HashSet(), deny)
    val got = Wand.topK(termBlocks, 10, avgdl, f).toSeq
    assert(got.forall(_.docId % 3 != 0))
    val want = naive.toSeq.filter(_._1 % 3 != 0).sortBy { case (d, s) => (-s, d) }
      .take(10).map { case (d, s) => ScoredDoc(d, s) }
    assert(got.map(_.docId) == want.map(_.docId))
  }

  test("threshold skips blocks that cannot reach tau (block-max pruning)") {
    // one frequent term, 2000 docs: most postings are weak (tf=1, long doc),
    // a few planted strong ones (tf=9, short doc). τ sits between the weak
    // and strong block maxes, so only blocks containing a planted posting
    // (plus boundary neighbors) should ever decode.
    val n = 2000L
    val strong = Set(37L, 555L, 1203L, 1800L)
    val ps = (0L until n).map { d =>
      if (strong(d)) (d, 9, 8) else (d, 1, 120)
    }
    val avgdl = ps.map(_._3).sum.toDouble / n
    val idf = Text.idf(n, n) // df = n (term in every doc)
    val blocks = ps.grouped(4).map { g =>
      IndexBuilder.encodeBlock("t", 0, g.map(_._1).toArray, g.map(_._2).toArray,
        g.map(_._3).toArray)
    }.toArray
    val ub = idf * blocks.map(b => Text.tfPartial(b.maxTf, b.minDl.toLong, avgdl)).max
    val weakMax = idf * Text.tfPartial(1, 120L, avgdl)
    val strongScore = idf * Text.tfPartial(9, 8L, avgdl)
    val tau = (weakMax + strongScore) / 2
    assert(weakMax < tau && tau < strongScore)
    val stats = new Wand.SearchStats
    val got = Wand.threshold(Seq((idf, ub, blocks)), tau, avgdl, stats = stats).toSeq
    assert(got.map(_.docId).sorted == strong.toSeq.sorted)
    assert(stats.totalBlocks == blocks.length.toLong)
    // 4 planted postings -> at most a handful of decoded blocks out of 500
    assert(stats.decodedBlocks <= strong.size + 2,
      s"decoded ${stats.decodedBlocks} of ${stats.totalBlocks}")
  }

  test("searchAfter cursor == naive rank window (200 random corpora)") {
    failAfter(Span(60, Seconds)) {
      val rnd = new Random(555)
      (0 until 200).foreach { iter =>
        val (termBlocks, naive, avgdl) = makeCorpus(rnd, 20 + rnd.nextInt(200), 2 + rnd.nextInt(20))
        val ranked = naive.toSeq.sortBy { case (d, s) => (-s, d) }
        if (ranked.size > 3) {
          val k = 1 + rnd.nextInt(5)
          val cut = rnd.nextInt(ranked.size - 1)
          val (cd, cs) = ranked(cut)
          val got = Wand.topK(termBlocks, k, avgdl, after = ScoredDoc(cd, cs)).toSeq
          val want = ranked.drop(cut + 1).take(k).map { case (d, s) => ScoredDoc(d, s) }
          assert(got.map(_.docId) == want.map(_.docId), s"iter=$iter cut=$cut k=$k")
        }
      }
    }
  }

  test("quantized block bounds: rank-identical topK + threshold (200 random corpora)") {
    failAfter(Span(60, Seconds)) {
      val rnd = new Random(777)
      (0 until 200).foreach { iter =>
        val (termBlocks, naive, avgdl) = makeCorpus(rnd, 20 + rnd.nextInt(200), 2 + rnd.nextInt(20))
        // quantize every block's bound metadata; recompute per-term ub
        val qBlocks = termBlocks.map { case (idf, _, bs) =>
          val qb = bs.map(IndexBuilder.quantizeBlock)
          val ub = idf * qb.map(b => Text.tfPartial(b.maxTf, b.minDl.toLong, avgdl)).max
          (idf, ub, qb)
        }
        val k = 1 + rnd.nextInt(10)
        val got = Wand.topK(qBlocks, k, avgdl).toSeq
        val want = naive.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
          .map { case (d, s) => ScoredDoc(d, s) }
        assert(got.map(_.docId) == want.map(_.docId), s"iter=$iter k=$k")
        got.zip(want).foreach { case (g, w) => assert(math.abs(g.score - w.score) < 1e-12) }
        val tau = 0.2 + rnd.nextDouble() * 2
        val gt = Wand.threshold(qBlocks, tau, avgdl).toSeq.sortBy(_.docId)
        val wt = naive.toSeq.filter(_._2 >= tau).sortBy(_._1)
        assert(gt.map(_.docId) == wt.map(_._1), s"iter=$iter tau=$tau")
      }
    }
  }

  test("Quant: admissible 4-significant-bit rounding") {
    val rnd = new Random(77)
    (0 until 5000).foreach { _ =>
      val v = 1 + rnd.nextInt(1 << 24)
      val up = IndexBuilder.Quant.ceil4(v)
      val dn = IndexBuilder.Quant.floor4(v)
      assert(up >= v && dn <= v, s"v=$v up=$up dn=$dn")
      assert(up <= v + v / 8, s"ceil4 too loose: $v -> $up") // <= 12.5% over
      assert(dn >= v - v / 8 - 1, s"floor4 too loose: $v -> $dn")
      // idempotent: quantized values are fixed points
      assert(IndexBuilder.Quant.ceil4(up) == up && IndexBuilder.Quant.floor4(dn) == dn)
    }
    (1 to 16).foreach(v => assert(IndexBuilder.Quant.ceil4(v) == v &&
      IndexBuilder.Quant.floor4(v) == v)) // small values exact
  }

  test("wand decodes fewer blocks than exist when k is small (skipping works)") {
    val rnd = new Random(7)
    // one strong rare term + one weak common term
    val (termBlocks, _, avgdl) = makeCorpus(rnd, 2000, 3)
    val cursorsTotalBlocks = termBlocks.map(_._3.length).sum
    assert(cursorsTotalBlocks > 20)
    // run with k=1: after the heap fills, block-max pruning should skip
    Wand.topK(termBlocks, 1, avgdl)
    // (decodedBlocks metric is internal to cursors created in topK; this
    // test asserts termination + correctness is covered above. Skipping
    // efficiency is asserted in EngineSpec via timing at bench scale.)
  }
}
