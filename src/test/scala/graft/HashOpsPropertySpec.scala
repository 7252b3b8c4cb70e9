package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HashOps

/** Property tests pinning the fused HashOps kernels to slow, obviously-
  * correct reference implementations over seeded random ASCII corpora —
  * the same math the DuckDB oracle replays, so a regression here breaks
  * oracle parity before the integration gate sees it. */
class HashOpsPropertySpec extends AnyFunSuite {

  private val P = HashOps.P
  private val rnd = new scala.util.Random(1234)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "k9", "x", "longword", "data", "spark", "the")

  private def randText(): String =
    (0 until (2 + rnd.nextInt(40))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def refPolyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc * 31 + cp) % P)

  private def refShingles(text: String, n: Int): Seq[Long] = {
    val th = text.trim.split(" ", -1).map(refPolyHash)
    if (th.length < n) Seq.empty
    else th.sliding(n).map(_.reduce((a, b) => (a * 131 + b) % P)).toSeq.distinct
  }

  test("polyHash: kernel == fold reference on 500 random strings") {
    (0 until 500).foreach { _ =>
      val t = randText()
      assert(HashOps.polyHash(UTF8String.fromString(t)) == refPolyHash(t), t)
    }
  }

  test("shingleHashes: kernel == sliding-window reference incl. short texts") {
    (0 until 300).foreach { _ =>
      val t = randText()
      val got = HashOps.shingleHashes(UTF8String.fromString(t), 3).toLongArray.toSeq
      assert(got == refShingles(t, 3), t)
    }
    assert(HashOps.shingleHashes(UTF8String.fromString("a b"), 3).numElements() == 0)
    assert(HashOps.shingleHashes(UTF8String.fromString(""), 3).numElements() == 0)
  }

  test("seqShingleHashes: ordered non-distinct variant of the set kernel") {
    (0 until 300).foreach { _ =>
      val t = randText()
      val got = HashOps.seqShingleHashes(UTF8String.fromString(t), 3).toLongArray.toSeq
      val th = t.trim.split(" ", -1).map(refPolyHash)
      val ref =
        if (th.length < 3) Seq.empty
        else th.sliding(3).map(_.reduce((a, b) => (a * 131 + b) % P)).toSeq
      assert(got == ref, t)            // index = n-gram start position
      assert(got.distinct ==           // first-occurrence distinct = set kernel
        HashOps.shingleHashes(UTF8String.fromString(t), 3).toLongArray.toSeq, t)
    }
    assert(HashOps.seqShingleHashes(UTF8String.fromString("a b"), 3).numElements() == 0)
    assert(HashOps.seqShingleHashes(UTF8String.fromString(""), 3).numElements() == 0)
  }

  test("hashEmbed: additive over concatenation, L1 = token count parity, slot = hash residue") {
    (0 until 300).foreach { _ =>
      val (a, b) = (randText(), randText())
      val d = 16
      def emb(t: String): Array[Float] = {
        val arr = HashOps.hashEmbed(UTF8String.fromString(t), d)
        Array.tabulate(d)(arr.getFloat)
      }
      val (ea, eb, eab) = (emb(a), emb(b), emb(a + " " + b))
      // bag-of-words linearity: embedding of the concatenation is the sum
      assert(eab.toSeq == ea.zip(eb).map { case (x, y) => x + y }.toSeq, s"$a | $b")
      // every token moves exactly one slot by ±1
      assert(ea.map(math.abs).sum <= a.trim.split(" ", -1).length)
      // reference: signed count per residue class of the token hash
      val ref = new Array[Int](d)
      a.trim.split(" ", -1).foreach { t =>
        val h = refPolyHash(t)
        ref((h % d).toInt) += (if ((h / d) % 2 == 0) 1 else -1)
      }
      assert(ea.toSeq == ref.map(_.toFloat).toSeq, a)
    }
  }

  test("minhashSig: each slot is the true min of the affine family") {
    (0 until 100).foreach { _ =>
      val t = randText()
      val sh = HashOps.shingleHashes(UTF8String.fromString(t), 3)
      if (sh.numElements() > 0) {
        val hs = sh.toLongArray
        val sig = HashOps.minhashSig(sh, 16).toLongArray
        (0 until 16).foreach { j =>
          val expect = hs.map(h => ((2L * j + 1) * h + 7919L * j + 12345L) % P).min
          assert(sig(j) == expect)
        }
      }
    }
  }

  test("simhash: permutation-invariant over tokens, bit-bounded") {
    (0 until 100).foreach { _ =>
      val toks = (0 until (3 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(vocab.size)))
      val a = HashOps.simhash(UTF8String.fromString(toks.mkString(" ")), 30)
      val b = HashOps.simhash(UTF8String.fromString(rnd.shuffle(toks).mkString(" ")), 30)
      assert(a == b)                      // distinct-token set is order-free
      assert(a >= 0 && a < (1L << 30))
    }
  }

  test("bandKeys: fold matches slice-by-slice reference") {
    val sig = Array.fill(16)(rnd.nextLong().abs % P)
    val keys = HashOps.bandKeys(
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig), 4, 4)
      .toLongArray
    (0 until 4).foreach { b =>
      val expect = sig.slice(b * 4, b * 4 + 4).foldLeft(0L)((acc, x) => (acc * 1000003L + x) % P)
      assert(keys(b) == expect)
    }
  }

  test("winnow: shared token run of >= w+n-1 guarantees a shared fingerprint") {
    val w = 4; val n = 3
    (0 until 100).foreach { _ =>
      val shared = (0 until (w + n - 1)).map(_ => vocab(rnd.nextInt(vocab.size)))
      val a = (randText().split(" ").toSeq ++ shared ++ randText().split(" ")).mkString(" ")
      val b = (randText().split(" ").toSeq ++ shared ++ randText().split(" ")).mkString(" ")
      val fa = HashOps.winnow(UTF8String.fromString(a), n, w).toLongArray.toSet
      val fb = HashOps.winnow(UTF8String.fromString(b), n, w).toLongArray.toSet
      assert(fa.intersect(fb).nonEmpty, s"no shared fingerprint:\n$a\n$b")
    }
  }

  test("winnow: density ~1/w of the shingle sequence, subset of shingles") {
    (0 until 100).foreach { _ =>
      val t = randText()
      val fps = HashOps.winnow(UTF8String.fromString(t), 3, 4).toLongArray.toSet
      val sh = HashOps.shingleHashes(UTF8String.fromString(t), 3).toLongArray.toSet
      if (sh.nonEmpty) {
        assert(fps.subsetOf(sh))
        assert(fps.nonEmpty)
      }
    }
  }
}
