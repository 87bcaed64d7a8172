package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Similarity.round6's guarded fast path (r15) to the exact
  * BigDecimal(shortest-decimal, HALF_UP) semantics it replaces — the
  * same rounding Spark's `round(_, 6)` uses, which the bitext kernels
  * must match bit-for-bit for oracle parity. */
class RoundSixSpec extends AnyFunSuite {

  private def slow(d: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def check(d: Double): Unit = {
    val f = graft.pipeline.Similarity.round6(d)
    val s = slow(d)
    assert(java.lang.Double.doubleToRawLongBits(f) ==
      java.lang.Double.doubleToRawLongBits(s) || f == s,
      s"round6($d): fast=$f slow=$s")
  }

  test("random cosines in [-1, 1]: fast == BigDecimal (10M samples)") {
    val rnd = new java.util.Random(42)
    var i = 0
    while (i < 10000000) {
      check(rnd.nextDouble() * 2 - 1)
      i += 1
    }
  }

  test("boundary-adversarial values: exact .5s, near-.5s, near-integers") {
    // exact decimal .5 boundaries at the 7th place (HALF_UP must round up)
    for (k <- -20 to 20; m <- Seq(5L, 15L, 25L, 9999995L)) {
      val d = (k * 10000000L + m) / 1e13 * 1e6 // spread magnitudes
      check(d)
      check((k.toDouble + m / 1e7))
      check(-(k.toDouble + m / 1e7))
    }
    // doubles straddling X.4999999/X.5000001 scaled boundaries
    val rnd = new java.util.Random(7)
    var i = 0
    while (i < 2000000) {
      val base = rnd.nextInt(2000001) - 1000000
      val jitter = (rnd.nextDouble() - 0.5) * 1e-8
      check((base + 0.5 + jitter) / 1e6)
      i += 1
    }
    // magnitudes outside the fast-path domain route through BigDecimal
    Seq(16.0000005, -16.0000005, 1e9 + 0.5e-6, 4.6e15, -4.6e15,
      Double.MaxValue, Double.MinPositiveValue, 0.0, -0.0).foreach(check)
  }
}
