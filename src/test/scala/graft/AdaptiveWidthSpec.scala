package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Dedup.adaptiveWidth

/** The data-following hash width (q62 buckets, q68 simhash blocks):
  * exact integer bit-length arithmetic, mirrored in the oracles as
  * `least(cap, greatest(floor, length(bin(n - 1)) - 5))`. The floor
  * pins the 500-row oracle sf to the original fixed widths; the cap
  * keeps shifted values positive in a signed BIGINT. */
class AdaptiveWidthSpec extends AnyFunSuite {

  test("floor holds through the oracle sfs (outputs unchanged there)") {
    // bitlen(n-1)-5 stays <= 4 through n = 512 -> width 4 (16 bits
    // for q68's 4-block fingerprint, the original fixture width)
    for (n <- Seq(1L, 2L, 50L, 500L, 512L))
      assert(adaptiveWidth(n, 4, 15) === 4, s"n=$n")
    assert(adaptiveWidth(513, 4, 15) === 5) // first widening step
  }

  test("width tracks bit-length: occupancy n/2^w stays in [16, 32)") {
    for (n <- Seq(5000L, 50000L, 150000L, 500000L, 5000000L)) {
      val w = adaptiveWidth(n, 4, 60)
      val occ = n.toDouble / (1L << w)
      assert(occ < 32.001, s"n=$n w=$w occ=$occ")
      assert(occ >= 16.0 || w == 4, s"n=$n w=$w occ=$occ")
    }
  }

  test("cap bounds the width (BIGINT positivity for 4-block simhash)") {
    assert(adaptiveWidth(Long.MaxValue, 4, 15) === 15)
    assert(adaptiveWidth(1L << 40, 4, 20) === 20)
  }

  test("agrees with the oracle's length(bin(n-1)) formula exactly") {
    // replicate the DuckDB side in Scala: length of the binary string
    def oracleSide(n: Long, floor: Int, cap: Int): Int = {
      val bitlen = java.lang.Long.toBinaryString(math.max(0L, n - 1)).length
      math.min(cap, math.max(floor, bitlen - 5))
    }
    var n = 1L
    while (n < (1L << 24)) { // sweep powers of two and neighbors
      for (m <- Seq(n - 1, n, n + 1) if m >= 1)
        assert(adaptiveWidth(m, 4, 20) === oracleSide(m, 4, 20), s"n=$m")
      n = n * 2
    }
  }
}
