package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable EWMA as affine-map composition.
  *
  * The exponential smoother s₀ = x₀, sₜ = α·xₜ + (1−α)·sₜ₋₁ is a
  * sequential recurrence windows can't express, and the obvious
  * distributed form — collect the whole series per key and fold — puts
  * a hot key's entire history in one row. The scalable observation:
  * each step is the affine map f(acc) = α·x + β·acc, and affine-map
  * composition is associative, so a contiguous RUN of steps reduces to
  * a single (m, b) pair with O(1) state:
  *
  *   compose step onto run:   m' = β·m,  b' = α·x + β·b
  *   apply run to seed x₀:    s  = m·x₀ + b
  *
  * The buffer holds an ordered list of such runs keyed by their
  * (ts, event_id) span. Inside one sorted partition a key's rows
  * arrive in order, so the buffer stays at exactly ONE run regardless
  * of series length — that is the memory bound the collect_list form
  * lacked. Arrival order is a hard input contract (reduce throws on a
  * violation rather than folding wrong — an out-of-order element can
  * never be spliced into an already-composed run); `TimeSeries
  * .queries` satisfies it with repartition-by-key +
  * sortWithinPartitions. `merge` stitches runs from different partials
  * in key order, which is correct whenever each partial covered a
  * key-contiguous slice (e.g. a range-partitioned-by-time layout); in
  * the hash-partitioned production shape each key lives in ONE
  * partition and merge only ever sees one non-empty side.
  *
  * Bit-exactness note: composition REASSOCIATES the float arithmetic
  * relative to the naive sequential fold (β·(m·x₀+b) ≠ (β·m)·x₀+(β·b)
  * in IEEE), so the oracle mirrors this exact formulation — an
  * identity-seeded fold over struct(m, b) with the same operand order
  * per step — rather than the plain value fold. Same trick as the
  * engine's other pinned-order folds: the two engines run the same
  * IEEE operation sequence, token for token. (A non-trivial
  * cross-partial stitch is exact in real arithmetic but may differ
  * from the one-pass fold at the last ulp — EwmaSpec pins the bound;
  * the verified query never takes that path.)
  *
  * Reference behavior: the reference renders per-user activity
  * streams raw (render-complete-deploy.js:552-599); the smoother is
  * the analytics-engine extension over the same events shape.
  */
object EwmaAffine {

  /** One contiguous ordered segment of a key's series.
    * (m, b) composes the affine maps of every element AFTER the run's
    * first element; the first element is carried as the seed.
    */
  case class Run(
      loTs: Long, loId: Long, hiTs: Long, hiId: Long,
      firstX: Double, m: Double, b: Double, n: Long)

  case class Buf(runs: List[Run])

  /** Input row: (tsMicros, eventId, value). */
  type In = (Long, Long, Double)

  class Agg(alpha: Double) extends Aggregator[In, Buf, Option[Double]] {
    private val beta = 1.0 - alpha

    override def zero: Buf = Buf(Nil)

    private def lt(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
      aTs < bTs || (aTs == bTs && aId < bId)

    override def reduce(buf: Buf, in: In): Buf = {
      val (ts, id, x) = in
      buf.runs match {
        case last :: rest =>
          // Composition is only valid for elements KNOWN consecutive in
          // final order, which is exactly the sorted-partition contract
          // — an out-of-order arrival can't be spliced into an
          // already-composed run later, so reject it loudly rather
          // than fold it wrong (EwmaSpec pins this).
          require(lt(last.hiTs, last.hiId, ts, id),
            s"EwmaAffine: out-of-order arrival ($ts,$id) after (${last.hiTs},${last.hiId}) — " +
              "feed the aggregator key-contiguous (ts, id)-sorted partitions")
          // In-order arrival: O(1) compose.
          // Operand order matters for oracle bit-parity: b' = α·x + β·b.
          Buf(last.copy(
            hiTs = ts, hiId = id,
            m = beta * last.m,
            b = alpha * x + beta * last.b,
            n = last.n + 1) :: rest)
        case Nil =>
          Buf(Run(ts, id, ts, id, x, 1.0, 0.0, 1L) :: Nil)
      }
    }

    /** Compose run `a` (earlier span) then run `b` (later span).
      * The elements after a.first are: a's tail, then b.first, then
      * b's tail — so push b.first's step map through, then b's map.
      */
    private def stitch(a: Run, b: Run): Run = {
      require(lt(a.hiTs, a.hiId, b.loTs, b.loId),
        s"EwmaAffine: interleaved run spans (${a.hiTs},${a.hiId}) vs (${b.loTs},${b.loId}) — " +
          "feed the aggregator key-contiguous sorted partitions")
      val m1 = beta * a.m                    // b.first's step composed onto a
      val b1 = alpha * b.firstX + beta * a.b
      Run(a.loTs, a.loId, b.hiTs, b.hiId, a.firstX,
        b.m * m1, b.m * b1 + b.b, a.n + b.n)
    }

    override def merge(x: Buf, y: Buf): Buf =
      if (x.runs.isEmpty) y
      else if (y.runs.isEmpty) x
      else Buf(x.runs ::: y.runs)

    override def finish(buf: Buf): Option[Double] =
      buf.runs.sortWith((a, b) => lt(a.loTs, a.loId, b.loTs, b.loId))
        .reduceOption(stitch)
        .map(r => r.m * r.firstX + r.b)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
  }

  /** Column-level UDAF: ewma(tsMicros, eventId, value). */
  def udafFor(alpha: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Agg(alpha))
}
