package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property check for the DivComparisonBounds implication formulas.
  *
  * The optimizer rule ADDS a bound on the raw column derived from a
  * comparison on `c div d` (truncating division, d > 0). Soundness
  * requires exactly one direction: whenever the ORIGINAL predicate holds,
  * the derived bound must hold too (a pushed filter may be weaker, never
  * stronger — rows it admits are re-filtered by the original predicate).
  * Truncating division with negative c is where the off-by-ones live, so
  * the sweep covers negatives, both small exhaustive and large random
  * ranges (seeded — deterministic across runs).
  */
class DivBoundsPropertySpec extends AnyFunSuite {

  private def checkOne(c: Long, d: Long, v: Long): Unit = {
    val q = c / d // JVM truncating division == Spark's `div`
    if (q >= v) assert(c >= v * d - (d - 1), s"ge: c=$c d=$d v=$v")
    if (q > v) assert(c >= v * d + 1, s"gt: c=$c d=$d v=$v")
    if (q <= v) assert(c <= v * d + (d - 1), s"le: c=$c d=$d v=$v")
    if (q < v) assert(c <= v * d - 1, s"lt: c=$c d=$d v=$v")
    if (q == v) assert(c >= v * d - (d - 1) && c <= v * d + (d - 1),
      s"eq: c=$c d=$d v=$v")
  }

  test("derived bounds are implied by the original comparison (exhaustive small)") {
    for (c <- -300L to 300L; d <- 1L to 12L; v <- -30L to 30L) checkOne(c, d, v)
  }

  test("derived bounds are implied (seeded random, epoch-scale values)") {
    val rnd = new scala.util.Random(0xC0FFEE)
    (1 to 200000).foreach { _ =>
      val c = rnd.nextLong() / 4 // avoid v*d overflow territory
      val d = 1L + rnd.nextInt(1000000)
      val v = (c / d) + rnd.nextInt(7) - 3 // cluster v around the boundary
      checkOne(c, d, v)
    }
  }

  test("for non-negative c the ge-bound inverse is exact (no lost rows)") {
    val rnd = new scala.util.Random(0xBEEF)
    (1 to 100000).foreach { _ =>
      val c = rnd.nextLong().abs / 4
      val d = 1L + rnd.nextInt(1000000)
      val v = (c / d) + rnd.nextInt(3) - 1
      if (v >= 0 && c >= v * d) assert(c / d >= v, s"c=$c d=$d v=$v")
    }
  }
}
