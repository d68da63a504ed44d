package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextSig
import graft.plans.HaversineKm

/** Property tests for the pure kernels (no Spark session needed).
  * Seeded sampling (no scalatest-scalacheck bridge in the offline cache). */
class PropertiesSpec extends AnyFunSuite {

  val rnd = new scala.util.Random(42)
  val vocab = Array("the", "fast", "key", "order", "sort", "table", "scan",
    "merge", "part", "window", "small", "hash", "join", "spark", "group")
  def sampleText(): String =
    Array.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  def sampleLat(): Double = rnd.nextDouble() * 178 - 89
  def sampleLon(): Double = rnd.nextDouble() * 358 - 179
  def forAllSamples(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  test("haversine: symmetric, non-negative, zero at identity, bounded by half circumference") {
    forAllSamples(200) {
      val (la1, lo1, la2, lo2) = (sampleLat(), sampleLon(), sampleLat(), sampleLon())
      val d12 = HaversineKm.compute(la1, lo1, la2, lo2)
      val d21 = HaversineKm.compute(la2, lo2, la1, lo1)
      assert(math.abs(d12 - d21) < 1e-9)
      assert(d12 >= 0.0 && d12 <= math.Pi * 6371.0 + 1e-6)
      assert(HaversineKm.compute(la1, lo1, la1, lo1) == 0.0)
    }
  }

  test("token hashes: in range [0, P), deterministic") {
    forAllSamples(100) {
      val t = sampleText()
      TextSig.tokens(t).foreach { tok =>
        val h = TextSig.tokenHash(tok)
        assert(h >= 0 && h < TextSig.P)
        assert(h == TextSig.tokenHash(tok))
      }
    }
  }

  test("minhash: appending text never increases any signature value") {
    // appending tokens preserves every existing 3-gram shingle and adds new
    // ones, so the shingle set grows and each per-hash minimum can only
    // drop — the monotonicity LSH banding relies on. Holds only once the
    // base text has >= 3 tokens (shorter docs have a partial shingle that
    // vanishes when real 3-grams appear).
    forAllSamples(150) {
      val (a, b) = (sampleText() + " extra pad tokens", sampleText())
      val sa = TextSig.minhashSig(a, 3, 16)
      val sab = TextSig.minhashSig(a + " " + b, 3, 16)
      sa.zip(sab).foreach { case (x, y) => assert(y <= x) }
    }
  }

  test("simhash: deterministic, 60-bit, identical text -> hamming 0") {
    forAllSamples(100) {
      val t = sampleText()
      val s = TextSig.simhash60(t, 3)
      assert(s >= 0 && s < (1L << 60))
      assert(java.lang.Long.bitCount(s ^ TextSig.simhash60(t, 3)) == 0)
    }
  }

  test("shingle hashes: distinct, and |shingles| <= max(|tokens|-2, 1)") {
    forAllSamples(100) {
      val t = sampleText()
      val hs = TextSig.shingleHashes(t, 3)
      assert(hs.toSet.size == hs.length)
      assert(hs.length <= math.max(TextSig.tokens(t).length - 2, 1))
    }
  }
}
