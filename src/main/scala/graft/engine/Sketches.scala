package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Aggregator, Window}
import graft.engine.{Tables => T}

/** Sketch-based approximate analytics: KMV distinct-count, count-min
  * frequency estimation, and equi-width histograms. The reference has
  * no aggregation surface at all (it imports drizzle `sum`/`count` and
  * never calls them, render-complete-deploy.js:16); these are the
  * bounded-memory summaries a 100 TB profile pass actually runs.
  *
  * Determinism discipline: every sketch here is hash-defined (md5) —
  * the SAME sketch is computed regardless of partitioning, executor
  * count, or visit order, so results are reproducible across runs AND
  * bit-comparable against the DuckDB oracle. (Sampling- or
  * order-sensitive sketches like reservoir/Misra-Gries can't make that
  * promise; that's why they're not the verified surface.)
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  /** KMV (k minimum values) distinct-count sketch as a typed
    * Aggregator: the buffer is the k lexicographically-smallest
    * DISTINCT md5 hex hashes seen — bounded at k strings no matter how
    * many rows flow in, and the merge is a sorted-merge-truncate, so
    * partial aggregation runs map-side and the shuffle carries ≤ k
    * values per group. Estimate: (k-1) / frac(kth smallest hash),
    * the classic bottom-k estimator; with fewer than k distinct
    * hashes the state IS the exact distinct set.
    *
    * The hex-string order is the numeric hash order (fixed 32-char
    * lowercase hex), and the first 13 hex chars (52 bits) convert to
    * an exactly-representable double, so the estimate is bit-equal in
    * any engine that can md5 — the property the oracle check relies
    * on. */
  /** Shared bottom-k state transitions (sorted distinct arrays),
    * delegated to by both Kmv (estimate output) and KmvKeep (sketch
    * output) so the two stay transition-identical. */
  private[engine] object KmvOps {
    def reduceSorted(b: Array[String], h: String, k: Int): Array[String] = {
      val idx = java.util.Arrays.binarySearch(b.asInstanceOf[Array[AnyRef]], h)
      if (idx >= 0) b // already in the sketch
      else {
        val ins = -idx - 1
        if (b.length >= k && ins >= k) b // larger than current kth min
        else {
          val out = new Array[String](math.min(b.length + 1, k))
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1,
            math.min(b.length - ins, out.length - ins - 1))
          out
        }
      }
    }
    def mergeSorted(a: Array[String], b: Array[String], k: Int): Array[String] = {
      // sorted-merge two distinct sorted arrays, keep the k smallest
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0; var j = 0
      while (out.length < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val h = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (out.isEmpty || out.last != h) out += h
      }
      out.toArray
    }
  }

  class Kmv(k: Int) extends Aggregator[String, Array[String], Double] {
    def zero: Array[String] = Array.empty
    def reduce(b: Array[String], h: String): Array[String] =
      KmvOps.reduceSorted(b, h, k)
    def merge(a: Array[String], b: Array[String]): Array[String] =
      KmvOps.mergeSorted(a, b, k)
    def finish(b: Array[String]): Double =
      if (b.length < k) b.length.toDouble
      else {
        val frac = java.lang.Long.parseLong(b(k - 1).substring(0, 13), 16)
          .toDouble / 4503599627370496.0 // 16^13 = 2^52
        // an all-zero 13-hex-digit prefix (p = 16^-13) would make frac
        // 0.0 and BigDecimal(Infinity) throw — clamp to the smallest
        // positive double so the estimate stays finite
        BigDecimal((k - 1).toDouble / math.max(frac, java.lang.Double.MIN_VALUE))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  /** The raw bottom-k sketch itself (sorted distinct md5 hex array)
    * instead of the finished estimate — the form you PERSIST: two
    * stored KmvKeep sketches support union (sorted-merge-truncate),
    * intersection, and Jaccard estimation LATER, without the data
    * (q127 does exactly that in pure Catalyst array ops). */
  class KmvKeep(k: Int) extends Aggregator[String, Array[String], Array[String]] {
    def zero: Array[String] = Array.empty
    def reduce(b: Array[String], h: String): Array[String] =
      KmvOps.reduceSorted(b, h, k)
    def merge(a: Array[String], b: Array[String]): Array[String] =
      KmvOps.mergeSorted(a, b, k)
    def finish(b: Array[String]): Array[String] = b
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** (k−1)·2^52 for k = 128 — the bottom-k estimate numerator, folded
    * once (127·2^52 is exactly representable) and interpolated into
    * the oracle like HllEstNumerator, so est_union is ONE int→double
    * conversion + ONE IEEE division on both engines. */
  val KmvEstNumerator: Double = 127.0 * 4503599627370496.0

  private val K = 128

  /** HyperLogLog distinct-count sketch as a typed Aggregator: m = 64
    * registers, each holding the max rank (1-based position of the
    * first 1-bit in a 52-bit md5 slice) among the hashes routed to
    * it. State is a fixed 64-int array no matter how many rows flow
    * in, and reduce/merge are pointwise max — fully commutative,
    * associative, AND idempotent, so unlike MG or the quantile sketch
    * the ENTIRE register state (not just the estimate) is order- and
    * partitioning-independent, duplicates are absorbed without a
    * distinct shuffle, and the oracle replays registers exactly.
    *
    * finish returns [zero_regs, sum_scaled] where sum_scaled =
    * Σ_j 2^(53 − reg_j), the harmonic-mean denominator scaled by 2^53
    * so it is an EXACT BIGINT (every term is an integer power of two;
    * an untouched register contributes 2^53). The classic raw
    * estimate α₆₄·m²/Σ 2^(−reg) is then derived OUTSIDE the sketch as
    * α₆₄·m²·2^53 / sum_scaled — one int64→double conversion plus one
    * IEEE division, bit-equal in any engine (the α₆₄·m²·2^53 constant
    * is folded once in Scala and interpolated into the oracle SQL in
    * shortest-round-trip form). Small-range/large-range bias
    * corrections need ln(), whose libm bits differ across engines —
    * they are a presentation concern applied downstream, not part of
    * the verified surface; zero_regs is emitted so a consumer CAN
    * apply linear counting. */
  abstract class HllBase[OUT] extends Aggregator[String, Array[Int], OUT] {
    protected val m = 64
    def zero: Array[Int] = new Array[Int](m)
    def reduce(b: Array[Int], hex: String): Array[Int] = {
      val j = java.lang.Integer.parseInt(hex.substring(0, 2), 16) % m
      val v = java.lang.Long.parseLong(hex.substring(2, 15), 16) // 52 bits
      // rank within the 52-bit slice: 53 − bit-length(v); all-zero slice → 53
      val rho = if (v == 0L) 53 else java.lang.Long.numberOfLeadingZeros(v) - 11
      if (rho > b(j)) b(j) = rho
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  }

  /** [zero_regs, sum_scaled] — see the scaladoc above. */
  class Hll extends HllBase[Array[Long]] {
    def finish(b: Array[Int]): Array[Long] = Sketches.hllFinish(b)
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The raw register array — the form a SKETCH STORE persists: a
    * nightly per-shard job writes one 64-int row per (shard, group),
    * and any later union of shards is answered by [[HllRegMerge]]
    * over the stored rows, never by rescanning the data (the same
    * persist-then-merge contract as [[KmvKeep]]). */
  class HllRegs extends HllBase[Array[Int]] {
    def finish(b: Array[Int]): Array[Int] = b
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  }

  /** Merge PERSISTED register arrays (pointwise max) into the same
    * [zero_regs, sum_scaled] the direct Hll pass produces — exactness
    * pinned in SketchesSpec's sketch-store round-trip. */
  class HllRegMerge extends Aggregator[Seq[Int], Array[Int], Array[Long]] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(b: Array[Int], regs: Seq[Int]): Array[Int] = {
      var i = 0
      while (i < b.length) { if (regs(i) > b(i)) b(i) = regs(i); i += 1 }
      b
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(b: Array[Int]): Array[Long] = Sketches.hllFinish(b)
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private[engine] def hllFinish(b: Array[Int]): Array[Long] = {
    var zeros = 0L; var sum = 0L; var i = 0
    while (i < b.length) {
      if (b(i) == 0) zeros += 1L
      sum += 1L << (53 - b(i))
      i += 1
    }
    Array(zeros, sum)
  }

  /** α₆₄·m²·2^53 for m = 64 (α₆₄ = 0.709, Flajolet et al. 2007),
    * folded ONCE here and interpolated into the oracle SQL via
    * Double.toString (shortest round-trip repr → identical bits on
    * parse), so both engines divide by sum_scaled from the same
    * constant instead of each folding the product their own way. */
  val HllEstNumerator: Double = 0.709 * 4096.0 * 9007199254740992.0

  /** Bloom-filter bitmap as a typed Aggregator over pre-hashed bit
    * positions: the buffer is `words` longs (words·64 bits); reduce
    * sets one bit, merge is pointwise OR — commutative, associative,
    * idempotent, so the bitmap is partitioning-independent and every
    * probe outcome is exactly replayable from position-set semantics
    * (bit j set ⟺ j ∈ {positions of inserted keys}). Hashing stays in
    * Catalyst (md5 → 52-bit prefix mod m, the q93 slot construction),
    * so the hot path is codegen'd and the JVM side never re-implements
    * the hash. State is words·8 bytes regardless of input size — the
    * broadcastable pre-filter a 100 TB decontamination pass ships to
    * every executor instead of the benchmark's full shingle set. */
  class BloomBits(words: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], p: Long): Array[Long] = {
      b((p >> 6).toInt) |= 1L << (p & 63L)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Misra-Gries heavy-hitters summary as a typed Aggregator: at most
    * `cap` (key → weight) counters. An unseen key past capacity
    * decrements every counter instead of inserting (the classic MG
    * step); merge sums counters pointwise, keeps the `cap` largest,
    * and subtracts the (cap+1)-th value from the survivors (Agarwal
    * et al., "Mergeable Summaries", PODS 2012) — so partial
    * aggregation runs map-side and the shuffle carries ≤ cap entries
    * per group. Bounds: true − N/(cap+1) ≤ weight ≤ true, and every
    * key with true count > N/(cap+1) survives (SketchesSpec pins both
    * on planted-skew data).
    *
    * Determinism discipline (see the object doc): MG is
    * order-sensitive ONCE EVICTING, so the oracle-verified query runs
    * it strictly in the EXACT regime — distinct keys ≤ cap, where no
    * decrement ever fires, the state is the exact count map, and the
    * result is partitioning-invariant. Under-capacity behavior is
    * spec'd, not oracled. `finish` renders "key:weight" entries sorted
    * by (weight desc, key) — a canonical string both engines can
    * produce. */
  class MisraGries(cap: Int) extends Aggregator[String, Map[String, Long], String] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], key: String): Map[String, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < cap => b.updated(key, 1L)
        case None => b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (sum.size <= cap) sum
      else {
        // deterministic truncation: order by (weight desc, key asc)
        val ordered = sum.toSeq.sortBy { case (k, c) => (-c, k) }
        val cut = ordered(cap)._2
        ordered.take(cap).map { case (k, c) => k -> (c - cut) }
          .filter(_._2 > 0).toMap
      }
    }
    def finish(b: Map[String, Long]): String =
      b.toSeq.sortBy { case (k, c) => (-c, k) }
        .map { case (k, c) => s"$k:$c" }.mkString(",")
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder = org.apache.spark.sql.Encoders.STRING
  }

  /** Mergeable quantile-sketch buffer: `buf` is the weight-1 append
    * buffer (first `used` slots valid); `levels(l)` is a SORTED run of
    * items with weight 2^(l+1). Total item count is exactly
    * `used + Σ levels(l).length · 2^(l+1)` — compactions preserve
    * weight (odd runs leave one element behind), so no separate count
    * field can drift. */
  case class QuantBuf(var buf: Array[Double], var used: Int,
                      var levels: Array[Array[Double]])

  /** Deterministic mergeable quantile summary (MRL98/KLL-family, with
    * the random compaction selector replaced by a FIXED every-other
    * selector — trading the randomized bound for a deterministic
    * worst-case one, the property the oracle check needs). State is
    * ≤ k weight-1 items plus ≤ k items per power-of-two level —
    * O(k log(n/k)) no matter how many rows flow in — and merge is
    * level-wise sorted-merge + compact, so partial aggregation runs
    * map-side and the shuffle carries one bounded sketch per group.
    *
    * Rank-error guarantee (hard, not probabilistic): each compaction
    * of a weight-w level introduces ≤ w rank error and runs ≤ n/(k·w)
    * times, so total error ≤ n·L/k with L = ⌈log2(n/k)⌉ levels. With
    * k = 2048 that is ≤ 0.2% of n at 10^6 rows and ≤ 1.5% at 10^12
    * rows — q121 asserts a fixed ε = 2% (valid to n ≈ 2·10^15).
    * Returned quantiles are actual data values (compaction keeps
    * elements, never averages), so their true rank is well-defined.
    *
    * The estimate itself is merge-order-sensitive (unlike the
    * hash-defined KMV), so the oracle-verified query outputs the
    * ε-bound CHECK (always-true booleans under the hard bound) plus
    * the exact quantiles as the auditable companion — the same
    * discipline as q93's `est ≥ true` overcount column. SketchesSpec
    * pins exactness in the ≤ k regime and the ε bound across
    * partitionings. */
  class QuantileSketch(k: Int, qs: Seq[Double])
      extends Aggregator[Double, QuantBuf, Array[Double]] {
    require(k >= 8 && k % 2 == 0, "capacity must be even")

    def zero: QuantBuf = QuantBuf(Array.empty, 0, Array.empty)

    /** Every-other selector over a sorted run; an odd tail element is
      * returned separately so total weight is exactly preserved. */
    private def halve(sorted: Array[Double]): (Array[Double], Option[Double]) = {
      val even = sorted.length - (sorted.length % 2)
      val out = new Array[Double](even / 2)
      var i = 0
      while (i < out.length) { out(i) = sorted(2 * i); i += 1 }
      (out, if (even < sorted.length) Some(sorted(even)) else None)
    }

    private def mergeSorted(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Double](a.length + b.length)
      var i = 0; var j = 0; var o = 0
      while (i < a.length && j < b.length) {
        if (a(i) <= b(j)) { out(o) = a(i); i += 1 }
        else { out(o) = b(j); j += 1 }
        o += 1
      }
      while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
      while (j < b.length) { out(o) = b(j); j += 1; o += 1 }
      out
    }

    /** Merge a sorted run into `levels(l)` (weight 2^(l+1)), cascading
      * compactions upward while a level exceeds k. */
    private def push(b: QuantBuf, run0: Array[Double], level0: Int): Unit = {
      var run = run0; var l = level0
      while (run.nonEmpty) {
        if (b.levels.length <= l)
          b.levels = b.levels ++ Array.fill(l + 1 - b.levels.length)(Array.empty[Double])
        val merged = mergeSorted(b.levels(l), run)
        if (merged.length <= k) { b.levels(l) = merged; run = Array.empty }
        else {
          val (up, leftover) = halve(merged)
          b.levels(l) = leftover.toArray
          run = up; l += 1
        }
      }
    }

    /** Sort + compact the weight-1 buffer into level 0. */
    private def flush(b: QuantBuf): Unit = if (b.used > 0) {
      val s = java.util.Arrays.copyOf(b.buf, b.used)
      java.util.Arrays.sort(s)
      val (up, leftover) = halve(s)
      b.used = 0
      leftover.foreach { v => b.buf(0) = v; b.used = 1 }
      push(b, up, 0)
    }

    def reduce(b: QuantBuf, v: Double): QuantBuf = {
      if (b.buf.length < k) b.buf = java.util.Arrays.copyOf(b.buf, k)
      b.buf(b.used) = v; b.used += 1
      if (b.used >= k) flush(b)
      b
    }

    def merge(a: QuantBuf, b: QuantBuf): QuantBuf = {
      // weight-1 buffers concatenate; in the ≤ k regime this never
      // compacts, so small-group results are EXACT and invariant
      if (a.used + b.used <= k) {
        if (a.buf.length < k && b.used > 0) a.buf = java.util.Arrays.copyOf(a.buf, k)
        System.arraycopy(b.buf, 0, a.buf, a.used, b.used)
        a.used += b.used
      } else { flush(a); flush(b); if (b.used > 0) { a.buf = java.util.Arrays.copyOf(a.buf, k); System.arraycopy(b.buf, 0, a.buf, a.used, b.used); a.used += b.used; if (a.used >= k) flush(a) } }
      var l = 0
      while (l < b.levels.length) {
        if (b.levels(l).nonEmpty) push(a, b.levels(l), l)
        l += 1
      }
      a
    }

    def finish(b: QuantBuf): Array[Double] = {
      // weighted k-way merge via one flat sort (state is O(k log n/k))
      val s = java.util.Arrays.copyOf(b.buf, b.used)
      java.util.Arrays.sort(s)
      val runs: Seq[(Array[Double], Long)] =
        (s, 1L) +: b.levels.toSeq.zipWithIndex.map { case (arr, l) => (arr, 1L << (l + 1)) }
      val flat = runs.flatMap { case (arr, w) => arr.map(v => (v, w)) }
        .sortBy(_._1).toArray
      val n = flat.iterator.map(_._2).sum
      if (n == 0) return qs.map(_ => Double.NaN).toArray
      qs.map { q =>
        val target = math.max(1L, math.ceil(q * n.toDouble).toLong)
        var cum = 0L; var i = 0; var out = flat.last._1
        while (i < flat.length && cum < target) {
          cum += flat(i)._2
          if (cum >= target) out = flat(i)._1
          i += 1
        }
        out
      }.toArray
    }

    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[QuantBuf]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Count-min slot for depth row `r`: 52-bit md5 prefix mod width. */
  private def slot(c: Column, r: Int, width: Int): Column =
    conv(substring(md5(concat(c, lit(s":cms$r"))), 1, 13), 16, 10)
      .cast("long") % width

  val queries: Map[String, Q] = Map(
    // Distinct-trigram cardinality per language via the KMV sketch,
    // alongside the exact count so the estimate is auditable. At
    // 100 TB the exact countDistinct is the expensive path (full
    // shuffle of the distinct space); the sketch column is the one
    // you'd keep — per-group state is k hashes regardless of corpus
    // size, and partial aggregation collapses everything map-side.
    "q92_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      val kmv = udaf(new Kmv(K))
      T.spread(T.documents(s, dir))
        .select($"lang", split(trim($"text"), "\\s+").as("ws"))
        .filter(size($"ws") >= 3)
        .select($"lang", explode(expr(
          """transform(sequence(1, size(ws) - 2),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
            |                 element_at(ws, i + 2)))""".stripMargin)).as("g"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_trigrams"),
          countDistinct($"g").as("true_distinct"),
          kmv(md5($"g")).as("est_distinct"))
        .withColumn("rel_err",
          Exact.trunc6($"est_distinct" / $"true_distinct".cast("double") - 1.0))
        .orderBy($"lang")
    }),

    // Count-min frequency estimation (depth 2 × width 16) for the
    // token stream, reported next to true counts: est ≥ true always,
    // and collisions show up as positive overcount. The sketch matrix
    // is built from the grouped token counts (identical to streaming
    // per-occurrence increments, since addition commutes); at 100 TB
    // the only corpus-sized shuffle is that combine-able groupBy —
    // the d×w matrix itself is 32 cells broadcast back to annotate.
    "q93_cms_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val W = 16
      val occ = T.spread(T.documents(s, dir))
        .select(explode(split(trim($"text"), "\\s+")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("true_cnt"))
      val sl = occ.select($"w", $"true_cnt",
        slot($"w", 0, W).as("s0"), slot($"w", 1, W).as("s1"))
        .cache() // feeds m0, m1, and the annotation join — one corpus agg, not three
      val m0 = sl.groupBy($"s0").agg(sum($"true_cnt").as("c0"))
      val m1 = sl.groupBy($"s1").agg(sum($"true_cnt").as("c1"))
      sl.join(broadcast(m0), "s0").join(broadcast(m1), "s1")
        .select($"w", $"true_cnt",
          least($"c0", $"c1").as("est_cnt"),
          (least($"c0", $"c1") - $"true_cnt").as("overcount"))
        .orderBy($"w")
    }),

    // Misra-Gries heavy hitters per user cohort: which event types
    // dominate each shard of the user base. cap = 8 > the 5 distinct
    // event types, so the sketch runs in its EXACT regime (no
    // eviction ⇒ order- and partitioning-independent — the only
    // regime an oracle can check; under-capacity bounds are spec'd in
    // SketchesSpec). At 100 TB the shuffle carries ≤ cap counters per
    // cohort instead of the full (cohort × type) count matrix, and
    // the summary merges associatively across any executor layout.
    "q112_heavy_hitters_mg" -> ((s, dir) => {
      import s.implicits._
      val mg = udaf(new MisraGries(8))
      T.events(s, dir)
        .select(($"user_id" % 5L).as("cohort"), $"event_type")
        .groupBy($"cohort")
        .agg(count(lit(1)).as("n_events"),
          mg($"event_type").as("heavy_hitters"))
        .orderBy($"cohort")
    }),

    // Mergeable quantile sketch over an unbounded continuous domain
    // (l_extendedprice) — the missing sibling of KMV/CMS/MG closed.
    // The sketch column (p50/p90/p99 estimates) is merge-order-
    // sensitive, so the VERIFIED output is (a) the exact discrete
    // quantiles computed the expensive way (per-group sort — the
    // auditable companion, like q92's true_distinct) and (b) the
    // hard ε-bound rank checks on the sketch estimates, which the
    // deterministic compaction guarantees always-true (ε = 2% covers
    // n up to ~2·10^15 at k = 2048). At 100 TB the sketch path is the
    // one you'd keep: one combine-able aggregation, O(k log n/k)
    // state per group, no global sort.
    "q121_quantile_sketch" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val eps = 0.02
      val qsk = udaf(new QuantileSketch(2048, Seq(0.5, 0.9, 0.99)))
      val d = T.spread(T.lineitem(s, dir))
        .select($"l_returnflag".as("grp"), $"l_extendedprice".as("v"))
      val est = d.groupBy($"grp")
        .agg(count(lit(1)).as("n"), qsk($"v").as("est"))
      // rank the estimates in the true data: lo = #{v < est}, hi = #{v ≤ est}
      val ranks = d.join(broadcast(est), "grp").groupBy($"grp").agg(
        first($"n").as("n"),
        sum(when($"v" < element_at($"est", 1), 1L).otherwise(0L)).as("lo50"),
        sum(when($"v" <= element_at($"est", 1), 1L).otherwise(0L)).as("hi50"),
        sum(when($"v" < element_at($"est", 2), 1L).otherwise(0L)).as("lo90"),
        sum(when($"v" <= element_at($"est", 2), 1L).otherwise(0L)).as("hi90"),
        sum(when($"v" < element_at($"est", 3), 1L).otherwise(0L)).as("lo99"),
        sum(when($"v" <= element_at($"est", 3), 1L).otherwise(0L)).as("hi99"))
      val w = Window.partitionBy($"grp").orderBy($"v")
      val exact = d.withColumn("rn", row_number().over(w))
        .join(broadcast(est.select($"grp", $"n")), "grp")
        .groupBy($"grp").agg(
          max(when($"rn" === greatest(lit(1L), ceil(lit(0.5) * $"n")), $"v")).as("p50_exact"),
          max(when($"rn" === greatest(lit(1L), ceil(lit(0.9) * $"n")), $"v")).as("p90_exact"),
          max(when($"rn" === greatest(lit(1L), ceil(lit(0.99) * $"n")), $"v")).as("p99_exact"))
      def ok(lo: Column, hi: Column, q: Double, n: Column): Column =
        (lo <= n * (q + eps)) && (hi >= n * (q - eps))
      ranks.join(exact, "grp")
        .select($"grp", $"n",
          $"p50_exact", $"p90_exact", $"p99_exact",
          ok($"lo50", $"hi50", 0.5, $"n").as("ok50"),
          ok($"lo90", $"hi90", 0.9, $"n").as("ok90"),
          ok($"lo99", $"hi99", 0.99, $"n").as("ok99"))
        .orderBy($"grp")
    }),

    // HyperLogLog distinct-trigram cardinality per language — the
    // constant-state sibling of q92's KMV (64 ints vs k=128 hashes;
    // HLL absorbs duplicates idempotently, KMV needs the dedup
    // binary-search). The exact countDistinct rides along as the
    // auditable companion; zero_regs + sum_scaled ARE the register
    // state (max is order-independent, so unlike every other
    // estimate-bearing sketch the estimator input itself is
    // oracle-exact). At 100 TB this is ONE combine-able aggregation —
    // no distinct shuffle — with 64 ints per group on the wire.
    // Pre-join cardinality estimation by Count-Min inner product (the
    // AMS/CMS join-size estimator, Alon-Matias-Szegedy / Cormode-
    // Muthukrishnan): |A ⋈ B on k| = Σ_k c_A(k)·c_B(k), estimated as
    // min over depths of Σ_j cmsA[d][j]·cmsB[d][j] — the planner-side
    // statistic that decides salting/broadcast BEFORE paying the
    // shuffle (q165's Gini tells you the skew; this tells you the
    // output size). Each table's CMS row is just a groupBy(slot)
    // count — combine-able, one scan, 64·2 longs of state per table,
    // merge-closed across shards. The true size is computed alongside
    // from per-key counts (never the join itself), so the row carries
    // estimate AND ground truth — the overestimate bound est ≥ exact
    // is a CMS theorem, spec-asserted. All integer arithmetic; one
    // IEEE division for the ratio.
    "q166_join_size_cms" -> ((s, dir) => {
      import s.implicits._
      // ONE corpus pass per table builds BOTH CMS depths (round 12):
      // the two per-depth passes each re-computed their own md5 slot
      // projection over the full table — grouping sets ((s0), (s1))
      // computes both slots in one projection and partial-aggregates
      // map-side into ≤ 2·64 cells per table (§2.3 aggregate before
      // the shuffle; §2.4 share one exchange). Per-depth counts are
      // IDENTICAL to the separate groupBys — grouping sets is exactly
      // the union of those groupings.
      def cms(df: DataFrame, key: String): DataFrame =
        df.select(col(key).cast("string").as("k")).select(
          expr("CAST(conv(substr(md5(concat(k, ':cms0')), 1, 13), 16, 10) " +
            "AS BIGINT) % 64").as("s0"),
          expr("CAST(conv(substr(md5(concat(k, ':cms1')), 1, 13), 16, 10) " +
            "AS BIGINT) % 64").as("s1"))
          .groupingSets(Seq(Seq($"s0"), Seq($"s1")), $"s0", $"s1")
          .agg(count(lit(1)).as("c"))
          .select(when($"s0".isNotNull, lit(0)).otherwise(lit(1)).as("d"),
            coalesce($"s0", $"s1").as("slot"), $"c")
      // est_d = Σ_slot cA[d][slot]·cB[d][slot]: a 128-row × 128-row
      // equi-join on (d, slot), folded to one row per depth.
      val ests = cms(T.lineitem(s, dir), "l_orderkey").as("a")
        .join(cms(T.orders(s, dir), "o_orderkey").as("b"), Seq("d", "slot"))
        .agg(sum(when($"d" === 0, $"a.c" * $"b.c")).as("est0"),
          sum(when($"d" === 1, $"a.c" * $"b.c")).as("est1"))
      // Exact size Σ_k cl(k)·co(k) WITHOUT the two-groupBy + SMJ
      // (round 12): tag each table's keys (cl, co) = (1,0)/(0,1),
      // union, ONE groupBy(k) folding both counts, then the scalar
      // fold. A join on k and a union-groupBy on k move the same
      // rows; the union needs one exchange and no sorts (before: 2
      // pre-aggregate exchanges + SMJ sorts — §2.4). Keys missing
      // from either side contribute cl·co = 0, exactly like the
      // inner join dropping them (lineitem⋈orders is never empty —
      // FK-shaped data — so the SUM's null-vs-0 edge cannot differ).
      val tagged = T.lineitem(s, dir)
        .select($"l_orderkey".as("k"), lit(1L).as("cl"), lit(0L).as("co"))
        .unionByName(T.orders(s, dir)
          .select($"o_orderkey".as("k"), lit(0L).as("cl"), lit(1L).as("co")))
      val exact = tagged.groupBy($"k")
        .agg(sum($"cl").as("cl"), sum($"co").as("co"))
        .agg(sum($"cl" * $"co").as("exact_size"))
      exact.crossJoin(broadcast(ests))
        .select($"exact_size", $"est0", $"est1",
          least($"est0", $"est1").as("est"),
          Exact.trunc6(least($"est0", $"est1").cast("double") /
            $"exact_size".cast("double")).as("blowup"))
    }),

    "q125_hll_distinct" -> ((s, dir) => {
      import s.implicits._
      val hll = udaf(new Hll)
      T.spread(T.documents(s, dir))
        .select($"lang", split(trim($"text"), "\\s+").as("ws"))
        .filter(size($"ws") >= 3)
        .select($"lang", explode(expr(
          """transform(sequence(1, size(ws) - 2),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
            |                 element_at(ws, i + 2)))""".stripMargin)).as("g"))
        .groupBy($"lang")
        .agg(countDistinct($"g").as("true_distinct"),
          hll(md5($"g")).as("st"))
        .select($"lang", $"true_distinct",
          element_at($"st", 1).as("zero_regs"),
          element_at($"st", 2).as("sum_scaled"),
          (lit(HllEstNumerator) / element_at($"st", 2).cast("double")).as("raw_est"))
        .orderBy($"lang")
    }),

    // Two-level sketch-store rollup AS A VERIFIED QUERY: stage 1
    // builds one HLL register array per (lang, shard) — the row a
    // nightly per-shard job would persist — and stage 2 answers the
    // cross-shard distinct question by MERGING THE STORED SKETCHES
    // (HllRegMerge, pointwise max), never re-touching the trigram
    // stream. The oracle computes the direct global registers, so the
    // bit-equal result IS the proof that the two-level path loses
    // nothing (max is associative — merge of shard maxima = global
    // max). At 100 TB stage 1 is the only corpus-sized pass and it
    // runs per shard/day; every later rollup is 64 ints × shards.
    "q128_sketch_store_rollup" -> ((s, dir) => {
      import s.implicits._
      val regs = udaf(new HllRegs)
      val regMerge = udaf(new HllRegMerge)
      val tg = T.spread(T.documents(s, dir))
        .select($"lang", $"doc_id", split(trim($"text"), "\\s+").as("ws"))
        .filter(size($"ws") >= 3)
        .select($"lang", $"doc_id", explode(expr(
          """transform(sequence(1, size(ws) - 2),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
            |                 element_at(ws, i + 2)))""".stripMargin)).as("g"))
      val stored = tg
        .groupBy($"lang", ($"doc_id" % 8L).as("shard"))
        .agg(regs(md5($"g")).as("hregs"))
      val merged = stored.groupBy($"lang")
        .agg(regMerge($"hregs").as("st"), count(lit(1)).as("n_shards"))
      tg.groupBy($"lang").agg(countDistinct($"g").as("true_distinct"))
        .join(merged, "lang")
        .select($"lang", $"n_shards", $"true_distinct",
          element_at($"st", 1).as("zero_regs"),
          element_at($"st", 2).as("sum_scaled"),
          (lit(HllEstNumerator) / element_at($"st", 2).cast("double")).as("raw_est"))
        .orderBy($"lang")
    }),

    // KMV set algebra: union / intersection / Jaccard of two corpus
    // halves' trigram sets, estimated FROM THE SKETCHES ALONE — the
    // two bottom-k states are built per side (one combine-able agg),
    // then union-merged in pure Catalyst array ops
    // (array_sort∘array_union then slice k — exactly KmvOps
    // .mergeSorted), matched hashes give ρ = |skU∩skA∩skB|/k, and
    // est_jaccard = ρ, est_union = (k−1)/frac(kth), est_intersection
    // = ρ·est_union (Beyer et al., SIGMOD 2007). True values ride
    // along as the auditable companion. At 100 TB the sides never
    // co-shuffle: each half is sketched where it lives (map-side,
    // ≤ k hashes on the wire), the 1-row sketches meet in a broadcast
    // cross, and set arithmetic on persisted sketches replaces ever
    // re-scanning either corpus.
    "q127_kmv_set_algebra" -> ((s, dir) => {
      import s.implicits._
      val keep = udaf(new KmvKeep(K))
      val tg = T.spread(T.documents(s, dir))
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
        .filter(size($"ws") >= 3)
        .select($"doc_id", explode(expr(
          """transform(sequence(1, size(ws) - 2),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
            |                 element_at(ws, i + 2)))""".stripMargin)).as("g"))
      val sides = tg.groupBy(($"doc_id" % 2 === 0).as("in_a"))
        .agg(keep(md5($"g")).as("sk"), countDistinct($"g").as("td"))
      val a = sides.filter($"in_a").select($"sk".as("ska"), $"td".as("tda"))
      val b = sides.filter(!$"in_a").select($"sk".as("skb"), $"td".as("tdb"))
      val u = tg.agg(countDistinct($"g").as("true_union"))
      a.crossJoin(broadcast(b)).crossJoin(broadcast(u))
        .withColumn("sku", expr(s"slice(array_sort(array_union(ska, skb)), 1, $K)"))
        .withColumn("matches",
          size(array_intersect(array_intersect($"sku", $"ska"), $"skb")).cast("long"))
        .withColumn("denom", least(lit(K.toLong), size($"sku").cast("long")))
        .withColumn("est_union",
          when(size($"sku") < K, size($"sku").cast("double"))
            .otherwise(lit(KmvEstNumerator) /
              conv(substring(element_at($"sku", K), 1, 13), 16, 10)
                .cast("long").cast("double")))
        .withColumn("est_jaccard", $"matches".cast("double") / $"denom".cast("double"))
        .select(lit(K.toLong).as("k"), $"tda", $"tdb", $"true_union",
          ($"tda" + $"tdb" - $"true_union").as("true_intersection"),
          (($"tda" + $"tdb" - $"true_union").cast("double") /
            $"true_union".cast("double")).as("true_jaccard"),
          $"matches", $"est_union",
          ($"est_jaccard" * $"est_union").as("est_intersection"),
          $"est_jaccard")
    }),

    // Equi-width histogram (20 buckets over the full price range).
    // The 1-row min/max aggregate travels as an explicit broadcast
    // cross join (the benign single-row pattern q22/q76 established —
    // a constant-key equi-join degenerates to the same plan once
    // FoldablePropagation rewrites the condition to `true`); then
    // bucketing is pure map-side arithmetic and the final rollup is
    // 20 rows. This is the profile-pass shape: two scans (or one,
    // with a cached stats row), zero wide shuffles.
    "q95_histogram" -> ((s, dir) => {
      import s.implicits._
      val li = T.lineitem(s, dir).select($"l_extendedprice".as("p"))
      val stats = li.agg(min($"p").as("mn"), max($"p").as("mx"))
      val width = ($"mx" - $"mn") / 20.0
      li.crossJoin(broadcast(stats))
        // constant column (mx = mn) ⇒ width 0 ⇒ NaN buckets: short-
        // circuit everything into bucket 0 (mirrored in the oracle)
        .select(when($"mx" === $"mn", lit(0L))
          .otherwise(least(lit(19L), floor(($"p" - $"mn") / width))).as("bucket"),
          $"mn", $"mx")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("cnt"), first($"mn").as("mn"), first($"mx").as("mx"))
        .select($"bucket",
          Exact.trunc6($"mn" + $"bucket".cast("double") * (($"mx" - $"mn") / 20.0)).as("lo"),
          Exact.trunc6($"mn" + ($"bucket" + 1L).cast("double") * (($"mx" - $"mn") / 20.0)).as("hi"),
          $"cnt")
        .orderBy($"bucket")
    }),

    // Rolling-window distinct users (trailing 7 days, per day) via
    // MERGED HLL register arrays — THE sliding-cardinality shape at
    // 100 TB: an exact rolling distinct needs the raw user set per
    // window (a 7-day self-join per day), while the sketch needs one
    // 64-int register row per day and a pointwise-max fold over ≤7
    // stored rows per output — the q128 sketch-store rollup bent
    // around a time axis. The register build is one combine-able pass
    // (day_distinct rides along as the exactness anchor); the window
    // merge is a bounded higher-order fold over the collected
    // day-arrays. The day axis is ~365 rows/year at ANY corpus size,
    // so the global day window is bounded by calendar, not data.
    // Oracle: per-day registers replayed from md5 nibbles in SQL (the
    // q125 device), the 7-day merge as a BETWEEN-join max — bit
    // equality proves merge-of-maxima ≡ max-over-union.
    "q208_rolling_distinct" -> ((s, dir) => {
      import s.implicits._
      val regs = udaf(new HllRegs)
      val perDay = T.events(s, dir)
        .groupBy(to_date($"ts").as("d"))
        .agg(regs(md5($"user_id".cast("string"))).as("regs"),
          countDistinct($"user_id").as("day_distinct"))
      // CALENDAR window, not row window: a RANGE frame over the
      // integer day index keeps the trailing-7-days semantics even
      // when the day axis has gaps (a 7-ROW frame would silently
      // stretch across them — and disagree with the oracle's BETWEEN)
      val w = Window.orderBy($"di").rangeBetween(-6, Window.currentRow)
      perDay
        .withColumn("di", datediff($"d", lit("1970-01-01").cast("date")))
        .withColumn("win_regs", collect_list($"regs").over(w))
        .withColumn("merged", expr(
          """aggregate(win_regs,
            |  transform(sequence(1, 64), x -> 0),
            |  (acc, r) -> zip_with(acc, r, (a, b) -> greatest(a, b)))"""
            .stripMargin))
        .withColumn("zero_regs",
          expr("CAST(size(filter(merged, x -> x = 0)) AS BIGINT)"))
        .withColumn("sum_scaled", expr(
          "aggregate(merged, CAST(0 AS BIGINT), (acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), 53 - x))"))
        .withColumn("est_users",
          lit(HllEstNumerator) / $"sum_scaled".cast("double"))
        .select($"d", $"day_distinct", $"zero_regs", $"sum_scaled",
          $"est_users")
        .orderBy($"d")
    }),

    // Bitmap-index set algebra: the viewer and purchaser user sets as
    // 64-bit WORD bitmaps (word = user_id div 64, bit = user_id mod
    // 64), built by a combine-able bit_or aggregate — OR is
    // merge-closed, so the index builds map-side and shuffles one
    // BIGINT per populated word (the roaring-bitmap layout with fixed
    // words; membership, intersection, union, and difference all
    // become bitwise ops + bit_count, never a distinct or a join on
    // user ids). The audience-overlap question (viewers ∩ purchasers,
    // Jaccard) folds to Σ bit_count(v & p) over the word-aligned full
    // outer join — at 100 TB that is |user space|/64 words, and the
    // same stored words answer ANY boolean audience combination.
    // Pure integer end-to-end (two's-complement bit patterns agree
    // across engines, including the sign bit).
    "q221_bitmap_index" -> ((s, dir) => {
      import s.implicits._
      def words(t: String) = T.events(s, dir)
        .filter($"event_type" === t)
        .select(expr("user_id div 64").as("w"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))")
            .as("b"))
        .groupBy($"w").agg(expr("bit_or(b)").as("bits"))
      val v = words("view").withColumnRenamed("bits", "vb")
      val p = words("purchase").withColumnRenamed("bits", "pb")
      v.join(p, Seq("w"), "full_outer")
        .select(coalesce($"vb", lit(0L)).as("vb"),
          coalesce($"pb", lit(0L)).as("pb"))
        .agg(sum(expr("bit_count(vb)")).cast("long").as("n_view"),
          sum(expr("bit_count(pb)")).cast("long").as("n_purchase"),
          sum(expr("bit_count(vb & pb)")).cast("long").as("n_both"),
          sum(expr("bit_count(vb | pb)")).cast("long").as("n_either"))
        .withColumn("jaccard_micro",
          expr("(n_both * 1000000) div n_either"))
        .withColumn("jaccard",
          $"jaccard_micro".cast("double") / lit(1000000.0))
    }))

  val oracle: Map[String, String] = Map(
    // Identical word/bit layout, bit_or build, bitwise set algebra.
    "q221_bitmap_index" ->
      """WITH vw AS (
        |  SELECT user_id // 64 AS w,
        |    bit_or(CASE WHEN user_id % 64 = 63 THEN -9223372036854775808
        |      ELSE 1::BIGINT << CAST(user_id % 64 AS INT) END) AS vb
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |pw AS (
        |  SELECT user_id // 64 AS w,
        |    bit_or(CASE WHEN user_id % 64 = 63 THEN -9223372036854775808
        |      ELSE 1::BIGINT << CAST(user_id % 64 AS INT) END) AS pb
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (
        |  SELECT coalesce(vw.vb, 0) AS vb, coalesce(pw.pb, 0) AS pb
        |  FROM vw FULL OUTER JOIN pw ON pw.w = vw.w),
        |agg AS (
        |  SELECT CAST(sum(bit_count(vb)) AS BIGINT) AS n_view,
        |    CAST(sum(bit_count(pb)) AS BIGINT) AS n_purchase,
        |    CAST(sum(bit_count(vb & pb)) AS BIGINT) AS n_both,
        |    CAST(sum(bit_count(vb | pb)) AS BIGINT) AS n_either
        |  FROM j)
        |SELECT n_view, n_purchase, n_both, n_either,
        |  (n_both * 1000000) // n_either AS jaccard_micro,
        |  CAST((n_both * 1000000) // n_either AS DOUBLE) / 1000000.0
        |    AS jaccard
        |FROM agg""".stripMargin,

    // Per-day registers from the same md5 nibbles, 7-day merge as a
    // BETWEEN-join max — merge-of-maxima ≡ max-over-union, bit-equal.
    "q208_rolling_distinct" ->
      s"""WITH u AS (
         |  SELECT DISTINCT date_trunc('day', ts)::DATE AS d,
         |    CAST(user_id AS VARCHAR) AS us
         |  FROM events),
         |b AS (
         |  SELECT d, CAST(('0x' || substr(md5(us), 1, 2)) AS BIGINT) % 64 AS j,
         |    CAST(('0x' || substr(md5(us), 3, 13)) AS BIGINT) AS v
         |  FROM u),
         |reg AS (
         |  SELECT d, j,
         |    max(CASE WHEN v = 0 THEN 53 ELSE 53 - length(bin(v)) END) AS r
         |  FROM b GROUP BY d, j),
         |days AS (SELECT DISTINCT d FROM u),
         |win AS (
         |  SELECT dy.d, r.j, max(r.r) AS r
         |  FROM days dy JOIN reg r ON r.d BETWEEN dy.d - 6 AND dy.d
         |  GROUP BY dy.d, r.j),
         |st AS (
         |  SELECT d, CAST(64 - count(*) AS BIGINT) AS zero_regs,
         |    CAST(sum(1::BIGINT << (53 - r))
         |         + (64 - count(*)) * (1::BIGINT << 53) AS BIGINT) AS sum_scaled
         |  FROM win GROUP BY d),
         |td AS (
         |  SELECT date_trunc('day', ts)::DATE AS d,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS day_distinct
         |  FROM events GROUP BY 1)
         |SELECT td.d, td.day_distinct, st.zero_regs, st.sum_scaled,
         |  ${HllEstNumerator} / CAST(st.sum_scaled AS DOUBLE) AS est_users
         |FROM td JOIN st USING (d) ORDER BY d""".stripMargin,

    "q166_join_size_cms" ->
      """WITH ls AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
        |      || ':cms0'), 1, 13)) AS BIGINT) % 64 AS s0,
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
        |      || ':cms1'), 1, 13)) AS BIGINT) % 64 AS s1
        |  FROM lineitem),
        |os AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
        |      || ':cms0'), 1, 13)) AS BIGINT) % 64 AS s0,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
        |      || ':cms1'), 1, 13)) AS BIGINT) % 64 AS s1
        |  FROM orders),
        |e0 AS (
        |  SELECT CAST(sum(a.ca * b.cb) AS BIGINT) AS est0 FROM
        |    (SELECT s0, count(*) AS ca FROM ls GROUP BY s0) a JOIN
        |    (SELECT s0, count(*) AS cb FROM os GROUP BY s0) b
        |    ON a.s0 = b.s0),
        |e1 AS (
        |  SELECT CAST(sum(a.ca * b.cb) AS BIGINT) AS est1 FROM
        |    (SELECT s1, count(*) AS ca FROM ls GROUP BY s1) a JOIN
        |    (SELECT s1, count(*) AS cb FROM os GROUP BY s1) b
        |    ON a.s1 = b.s1),
        |ex AS (
        |  SELECT CAST(sum(a.cl * b.co) AS BIGINT) AS exact_size FROM
        |    (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem
        |     GROUP BY 1) a JOIN
        |    (SELECT o_orderkey AS k, count(*) AS co FROM orders
        |     GROUP BY 1) b ON a.k = b.k)
        |SELECT exact_size, est0, est1, least(est0, est1) AS est,
        |  floor((CAST(least(est0, est1) AS DOUBLE) /
        |    CAST(exact_size AS DOUBLE)) * 1000000.0) / 1000000.0 AS blowup
        |FROM ex CROSS JOIN e0 CROSS JOIN e1""".stripMargin,

    "q92_kmv_distinct" ->
      s"""WITH raw AS (
         |  SELECT lang, doc_id,
         |    unnest(string_split_regex(trim(text), '\\s+')) AS w,
         |    generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS ord
         |  FROM documents),
         |seq AS (SELECT lang, doc_id, w,
         |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
         |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
         |  FROM raw),
         |tg AS (SELECT lang, w || ' ' || w1 || ' ' || w2 AS g
         |       FROM seq WHERE w2 IS NOT NULL),
         |h AS (SELECT DISTINCT lang, md5(g) AS hv FROM tg),
         |r AS (SELECT lang, hv,
         |    row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
         |  FROM h),
         |kth AS (SELECT lang, hv FROM r WHERE rn = $K),
         |agg AS (SELECT lang, count(*) AS n_trigrams,
         |               count(DISTINCT g) AS true_distinct
         |        FROM tg GROUP BY lang)
         |SELECT a.lang,
         |  CAST(a.n_trigrams AS BIGINT) AS n_trigrams,
         |  CAST(a.true_distinct AS BIGINT) AS true_distinct,
         |  CASE WHEN k.hv IS NULL THEN CAST(a.true_distinct AS DOUBLE)
         |       ELSE round(${K - 1}.0 /
         |         (CAST(('0x' || substr(k.hv, 1, 13)) AS BIGINT)::DOUBLE
         |          / 4503599627370496.0), 6) END AS est_distinct,
         |  floor(((CASE WHEN k.hv IS NULL THEN CAST(a.true_distinct AS DOUBLE)
         |       ELSE round(${K - 1}.0 /
         |         (CAST(('0x' || substr(k.hv, 1, 13)) AS BIGINT)::DOUBLE
         |          / 4503599627370496.0), 6) END)
         |    / CAST(a.true_distinct AS DOUBLE) - 1.0) * 1000000.0)
         |    / 1000000.0 AS rel_err
         |FROM agg a LEFT JOIN kth k ON k.lang = a.lang
         |ORDER BY a.lang""".stripMargin,

    "q93_cms_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |occ AS (SELECT w, count(*) AS true_cnt FROM tok GROUP BY w),
        |sl AS (SELECT w, true_cnt,
        |    CAST(('0x' || substr(md5(w || ':cms0'), 1, 13)) AS BIGINT) % 16 AS s0,
        |    CAST(('0x' || substr(md5(w || ':cms1'), 1, 13)) AS BIGINT) % 16 AS s1
        |  FROM occ),
        |m0 AS (SELECT s0, CAST(sum(true_cnt) AS BIGINT) AS c0 FROM sl GROUP BY s0),
        |m1 AS (SELECT s1, CAST(sum(true_cnt) AS BIGINT) AS c1 FROM sl GROUP BY s1)
        |SELECT sl.w, CAST(sl.true_cnt AS BIGINT) AS true_cnt,
        |  least(m0.c0, m1.c1) AS est_cnt,
        |  least(m0.c0, m1.c1) - sl.true_cnt AS overcount
        |FROM sl JOIN m0 ON m0.s0 = sl.s0 JOIN m1 ON m1.s1 = sl.s1
        |ORDER BY sl.w""".stripMargin,

    "q112_heavy_hitters_mg" ->
      """WITH c AS (
        |  SELECT user_id % 5 AS cohort, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT cohort,
        |  CAST(sum(cnt) AS BIGINT) AS n_events,
        |  string_agg(event_type || ':' || cnt, ','
        |             ORDER BY cnt DESC, event_type) AS heavy_hitters
        |FROM c GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q121_quantile_sketch" ->
      """WITH d AS (
        |  SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem),
        |n AS (SELECT grp, count(*) AS n FROM d GROUP BY grp),
        |r AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
        |      FROM d)
        |SELECT n.grp, CAST(n.n AS BIGINT) AS n,
        |  max(CASE WHEN r.rn = greatest(1, CAST(ceil(0.5 * n.n) AS BIGINT))
        |           THEN r.v END) AS p50_exact,
        |  max(CASE WHEN r.rn = greatest(1, CAST(ceil(0.9 * n.n) AS BIGINT))
        |           THEN r.v END) AS p90_exact,
        |  max(CASE WHEN r.rn = greatest(1, CAST(ceil(0.99 * n.n) AS BIGINT))
        |           THEN r.v END) AS p99_exact,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM r JOIN n ON r.grp = n.grp
        |GROUP BY n.grp, n.n ORDER BY n.grp""".stripMargin,

    "q125_hll_distinct" ->
      s"""WITH raw AS (
         |  SELECT lang, doc_id,
         |    unnest(string_split_regex(trim(text), '\\s+')) AS w,
         |    generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS ord
         |  FROM documents),
         |seq AS (SELECT lang, doc_id, w,
         |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
         |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
         |  FROM raw),
         |tg AS (SELECT lang, w || ' ' || w1 || ' ' || w2 AS g
         |       FROM seq WHERE w2 IS NOT NULL),
         |b AS (SELECT lang,
         |    CAST(('0x' || substr(md5(g), 1, 2)) AS BIGINT) % 64 AS j,
         |    CAST(('0x' || substr(md5(g), 3, 13)) AS BIGINT) AS v
         |  FROM tg),
         |reg AS (SELECT lang, j,
         |    max(CASE WHEN v = 0 THEN 53 ELSE 53 - length(bin(v)) END) AS r
         |  FROM b GROUP BY lang, j),
         |st AS (SELECT lang,
         |    CAST(64 - count(*) AS BIGINT) AS zero_regs,
         |    CAST(sum(1::BIGINT << (53 - r))
         |         + (64 - count(*)) * (1::BIGINT << 53) AS BIGINT) AS sum_scaled
         |  FROM reg GROUP BY lang),
         |td AS (SELECT lang, count(DISTINCT g) AS true_distinct
         |       FROM tg GROUP BY lang)
         |SELECT td.lang,
         |  CAST(td.true_distinct AS BIGINT) AS true_distinct,
         |  st.zero_regs, st.sum_scaled,
         |  ${HllEstNumerator} / CAST(st.sum_scaled AS DOUBLE) AS raw_est
         |FROM td JOIN st ON st.lang = td.lang
         |ORDER BY td.lang""".stripMargin,

    "q128_sketch_store_rollup" ->
      s"""WITH raw AS (
         |  SELECT lang, doc_id,
         |    unnest(string_split_regex(trim(text), '\\s+')) AS w,
         |    generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS ord
         |  FROM documents),
         |seq AS (SELECT lang, doc_id, w,
         |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
         |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
         |  FROM raw),
         |tg AS (SELECT lang, doc_id, w || ' ' || w1 || ' ' || w2 AS g
         |       FROM seq WHERE w2 IS NOT NULL),
         |b AS (SELECT lang,
         |    CAST(('0x' || substr(md5(g), 1, 2)) AS BIGINT) % 64 AS j,
         |    CAST(('0x' || substr(md5(g), 3, 13)) AS BIGINT) AS v
         |  FROM tg),
         |reg AS (SELECT lang, j,
         |    max(CASE WHEN v = 0 THEN 53 ELSE 53 - length(bin(v)) END) AS r
         |  FROM b GROUP BY lang, j),
         |st AS (SELECT lang,
         |    CAST(64 - count(*) AS BIGINT) AS zero_regs,
         |    CAST(sum(1::BIGINT << (53 - r))
         |         + (64 - count(*)) * (1::BIGINT << 53) AS BIGINT) AS sum_scaled
         |  FROM reg GROUP BY lang),
         |ns AS (SELECT lang,
         |    CAST(count(DISTINCT doc_id % 8) AS BIGINT) AS n_shards,
         |    CAST(count(DISTINCT g) AS BIGINT) AS true_distinct
         |  FROM tg GROUP BY lang)
         |SELECT ns.lang, ns.n_shards, ns.true_distinct,
         |  st.zero_regs, st.sum_scaled,
         |  ${HllEstNumerator} / CAST(st.sum_scaled AS DOUBLE) AS raw_est
         |FROM ns JOIN st ON st.lang = ns.lang
         |ORDER BY ns.lang""".stripMargin,

    "q127_kmv_set_algebra" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    unnest(string_split_regex(trim(text), '\\s+')) AS w,
         |    generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS ord
         |  FROM documents),
         |seq AS (SELECT doc_id, w,
         |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
         |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
         |  FROM raw),
         |tg AS (SELECT doc_id, w || ' ' || w1 || ' ' || w2 AS g
         |       FROM seq WHERE w2 IS NOT NULL),
         |ha AS (SELECT DISTINCT md5(g) AS hv FROM tg WHERE doc_id % 2 = 0),
         |hb AS (SELECT DISTINCT md5(g) AS hv FROM tg WHERE doc_id % 2 = 1),
         |ska AS (SELECT hv FROM ha ORDER BY hv LIMIT $K),
         |skb AS (SELECT hv FROM hb ORDER BY hv LIMIT $K),
         |sku AS (SELECT hv FROM
         |          (SELECT hv FROM ska UNION SELECT hv FROM skb) z
         |        ORDER BY hv LIMIT $K),
         |szu AS (SELECT count(*) AS sz FROM sku),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS matches FROM sku
         |      WHERE hv IN (SELECT hv FROM ska)
         |        AND hv IN (SELECT hv FROM skb)),
         |ta AS (SELECT CAST(count(*) AS BIGINT) AS tda FROM ha),
         |tb AS (SELECT CAST(count(*) AS BIGINT) AS tdb FROM hb),
         |tu AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS true_union FROM tg)
         |SELECT CAST($K AS BIGINT) AS k, ta.tda, tb.tdb, tu.true_union,
         |  ta.tda + tb.tdb - tu.true_union AS true_intersection,
         |  CAST(ta.tda + tb.tdb - tu.true_union AS DOUBLE)
         |    / CAST(tu.true_union AS DOUBLE) AS true_jaccard,
         |  m.matches,
         |  CASE WHEN szu.sz < $K THEN CAST(szu.sz AS DOUBLE)
         |       ELSE ${KmvEstNumerator} / CAST(CAST(('0x' || substr(
         |         (SELECT hv FROM sku ORDER BY hv DESC LIMIT 1), 1, 13))
         |         AS BIGINT) AS DOUBLE) END AS est_union,
         |  (CAST(m.matches AS DOUBLE) / CAST(least($K, szu.sz) AS DOUBLE))
         |    * (CASE WHEN szu.sz < $K THEN CAST(szu.sz AS DOUBLE)
         |       ELSE ${KmvEstNumerator} / CAST(CAST(('0x' || substr(
         |         (SELECT hv FROM sku ORDER BY hv DESC LIMIT 1), 1, 13))
         |         AS BIGINT) AS DOUBLE) END) AS est_intersection,
         |  CAST(m.matches AS DOUBLE) / CAST(least($K, szu.sz) AS DOUBLE)
         |    AS est_jaccard
         |FROM ta, tb, tu, m, szu""".stripMargin,

    "q95_histogram" ->
      """WITH s AS (
        |  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem),
        |b AS (SELECT
        |    CASE WHEN s.mx = s.mn THEN 0
        |         ELSE least(19, CAST(floor((l_extendedprice - s.mn) / ((s.mx - s.mn) / 20.0))
        |      AS BIGINT)) END AS bucket, s.mn, s.mx
        |  FROM lineitem, s),
        |g AS (SELECT bucket, count(*) AS cnt, min(mn) AS mn, min(mx) AS mx
        |      FROM b GROUP BY bucket)
        |SELECT bucket,
        |  floor((mn + CAST(bucket AS DOUBLE) * ((mx - mn) / 20.0)) * 1000000.0)
        |    / 1000000.0 AS lo,
        |  floor((mn + CAST(bucket + 1 AS DOUBLE) * ((mx - mn) / 20.0)) * 1000000.0)
        |    / 1000000.0 AS hi,
        |  CAST(cnt AS BIGINT) AS cnt
        |FROM g ORDER BY bucket""".stripMargin)
}
