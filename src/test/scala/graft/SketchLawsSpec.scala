package graft.engine

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic laws of the sketch state machines, property-checked over
  * arbitrary inputs (ScalaCheck). These are the PROOF OBLIGATIONS the
  * distributed-correctness claims rest on: partial aggregation and
  * shuffle layout are free to split/reorder the input any way they
  * like, so every sketch must be a fold into a commutative monoid —
  * reduce-then-merge over ANY partition of the input must equal the
  * straight fold. The Spark-level invariance specs (SketchesSpec)
  * check a handful of layouts; these laws cover the algebra itself.
  */
object SketchLawsSpec extends Properties("SketchAlgebra") {
  private val K = 16

  // --- KMV: bottom-k distinct state -------------------------------
  private val strings: Gen[List[String]] =
    Gen.listOf(Gen.choose(0, 9999).map(n => f"v$n%04d"))

  private def kmvFold(xs: Seq[String]): Array[String] =
    xs.foldLeft(Array.empty[String])((b, h) => Sketches.KmvOps.reduceSorted(b, h, K))

  property("KMV state IS the k smallest distinct values (any order)") =
    forAll(strings) { xs =>
      kmvFold(xs).toList == xs.distinct.sorted.take(K)
    }

  property("KMV merge is the split homomorphism: merge(fold(a), fold(b)) = fold(a++b)") =
    forAll(strings, strings) { (a, b) =>
      Sketches.KmvOps.mergeSorted(kmvFold(a), kmvFold(b), K).toList ==
        kmvFold(a ++ b).toList
    }

  property("KMV merge is commutative and absorbs the empty sketch") =
    forAll(strings, strings) { (a, b) =>
      val ab = Sketches.KmvOps.mergeSorted(kmvFold(a), kmvFold(b), K).toList
      val ba = Sketches.KmvOps.mergeSorted(kmvFold(b), kmvFold(a), K).toList
      val ae = Sketches.KmvOps.mergeSorted(kmvFold(a), Array.empty, K).toList
      ab == ba && ae == kmvFold(a).toList
    }

  // --- HLL: pointwise-max registers -------------------------------
  private val hexes: Gen[List[String]] =
    Gen.listOf(Gen.listOfN(32, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString))

  private def hllFold(xs: Seq[String]): Array[Int] = {
    val h = new Sketches.Hll
    xs.foldLeft(h.zero)((b, x) => h.reduce(b, x))
  }

  property("HLL registers are permutation-invariant") =
    forAll(hexes, Gen.long) { (xs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      hllFold(xs).toList == hllFold(shuffled).toList
    }

  property("HLL merge is the split homomorphism and is idempotent") =
    forAll(hexes, hexes) { (a, b) =>
      val h = new Sketches.Hll
      val merged = h.merge(hllFold(a), hllFold(b))
      val self = h.merge(hllFold(a), hllFold(a))
      merged.toList == hllFold(a ++ b).toList &&
        self.toList == hllFold(a).toList
    }

  property("HllRegMerge over shard registers = direct merge") =
    forAll(hexes, hexes, hexes) { (a, b, c) =>
      val rm = new Sketches.HllRegMerge
      val viaStore = Seq(a, b, c).map(hllFold).map(_.toSeq)
        .foldLeft(rm.zero)((acc, regs) => rm.reduce(acc, regs))
      viaStore.toList == hllFold(a ++ b ++ c).toList
    }

  // --- Bloom: OR-monoid bitmap ------------------------------------
  private val positions: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 1023L))

  private def bloomFold(ps: Seq[Long]): Array[Long] = {
    val bb = new Sketches.BloomBits(16)
    ps.foldLeft(bb.zero)((b, p) => bb.reduce(b, p))
  }

  private def bitsOf(bm: Array[Long]): Set[Long] =
    (0L until 1024L).filter(j => ((bm((j >> 6).toInt) >> (j & 63L)) & 1L) == 1L).toSet

  property("Bloom bitmap IS the set of inserted positions") =
    forAll(positions) { ps => bitsOf(bloomFold(ps)) == ps.toSet }

  property("Bloom merge is the split homomorphism (pointwise OR)") =
    forAll(positions, positions) { (a, b) =>
      val bb = new Sketches.BloomBits(16)
      bb.merge(bloomFold(a), bloomFold(b)).toList == bloomFold(a ++ b).toList
    }
}
