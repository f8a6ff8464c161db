package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Holt (double-exponential / level+trend) smoothing as
  * 2×2 affine-map composition — the trend-aware sibling of
  * [[EwmaAffine]].
  *
  * Holt's recurrence over a series x₁, x₂, …:
  *
  *   l₁ = x₁, b₁ = 0
  *   lₜ = α·xₜ + (1−α)(lₜ₋₁ + bₜ₋₁)
  *   bₜ = γ(lₜ − lₜ₋₁) + (1−γ)bₜ₋₁
  *
  * Each step is affine in the state vector s = (l, b):
  *   s' = M·s + c(x),  M = [[A, A], [−γα, γA+G]],  c = (αx, γαx)
  * with A = 1−α, G = 1−γ — and affine-map composition is associative,
  * so a contiguous RUN of steps reduces to a single (M, c) pair with
  * O(1) state, exactly the EwmaAffine argument lifted from scalars to
  * 2×2 matrices. Same memory bound (one run per sorted partition),
  * same hard in-order input contract (out-of-order arrival throws
  * rather than folds wrong), same key-contiguous stitch in `merge`.
  *
  * Bit-exactness: the oracle replays the identical composition as a
  * `list_reduce` over struct(m11…m22, b1, b2) with the same operand
  * order per IEEE multiply/add — and the default (α, γ) = (0.5, 0.25)
  * makes every map constant dyadic (0.5, −0.125, 0.875, 0.125), so
  * the constants themselves carry no decimal-repr noise.
  *
  * Reference behavior: the reference renders per-user activity raw
  * (render-complete-deploy.js:552-599); trend-aware smoothing is the
  * forecasting extension over the same events shape.
  */
object HoltAffine {

  /** One contiguous ordered segment of a key's series. (m11…m22,
    * b1, b2) compose the affine maps of every element AFTER the run's
    * first element; the first element is carried as the seed. */
  case class Run(
      loTs: Long, loId: Long, hiTs: Long, hiId: Long, firstX: Double,
      m11: Double, m12: Double, m21: Double, m22: Double,
      b1: Double, b2: Double, n: Long)

  case class Buf(runs: List[Run])

  /** Smoothed output: level, trend, and the h=3 forecast l + 3b. */
  case class Out(level: Double, trend: Double, fc3: Double)

  /** Input row: (tsMicros, eventId, value). */
  type In = (Long, Long, Double)

  class Agg(alpha: Double, gamma: Double)
      extends Aggregator[In, Buf, Option[Out]] {
    private val a = 1.0 - alpha          // A
    private val ga = gamma * alpha       // γα
    private val nga = -ga                // −γα
    private val gag = gamma * a + (1.0 - gamma) // γA+G

    override def zero: Buf = Buf(Nil)

    private def lt(aTs: Long, aId: Long, bTs: Long, bId: Long): Boolean =
      aTs < bTs || (aTs == bTs && aId < bId)

    /** Compose the step map of element x ONTO accumulated run r
      * (total = step ∘ run). Operand order is the oracle contract. */
    private def step(r: Run, ts: Long, id: Long, x: Double): Run =
      r.copy(
        hiTs = ts, hiId = id,
        m11 = a * r.m11 + a * r.m21,
        m12 = a * r.m12 + a * r.m22,
        m21 = nga * r.m11 + gag * r.m21,
        m22 = nga * r.m12 + gag * r.m22,
        b1 = a * r.b1 + a * r.b2 + alpha * x,
        b2 = nga * r.b1 + gag * r.b2 + ga * x,
        n = r.n + 1)

    override def reduce(buf: Buf, in: In): Buf = {
      val (ts, id, x) = in
      buf.runs match {
        case last :: rest =>
          require(lt(last.hiTs, last.hiId, ts, id),
            s"HoltAffine: out-of-order arrival ($ts,$id) after (${last.hiTs},${last.hiId}) — " +
              "feed the aggregator key-contiguous (ts, id)-sorted partitions")
          Buf(step(last, ts, id, x) :: rest)
        case Nil =>
          Buf(Run(ts, id, ts, id, x, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1L) :: Nil)
      }
    }

    /** Compose run `a` (earlier span) then run `b` (later span): push
      * b.first's step through a, then b's matrix over that. */
    private def stitch(x: Run, y: Run): Run = {
      require(lt(x.hiTs, x.hiId, y.loTs, y.loId),
        s"HoltAffine: interleaved run spans (${x.hiTs},${x.hiId}) vs (${y.loTs},${y.loId}) — " +
          "feed the aggregator key-contiguous sorted partitions")
      val m = step(x, y.loTs, y.loId, y.firstX)
      Run(x.loTs, x.loId, y.hiTs, y.hiId, x.firstX,
        y.m11 * m.m11 + y.m12 * m.m21,
        y.m11 * m.m12 + y.m12 * m.m22,
        y.m21 * m.m11 + y.m22 * m.m21,
        y.m21 * m.m12 + y.m22 * m.m22,
        y.m11 * m.b1 + y.m12 * m.b2 + y.b1,
        y.m21 * m.b1 + y.m22 * m.b2 + y.b2,
        x.n + y.n)
    }

    override def merge(x: Buf, y: Buf): Buf =
      if (x.runs.isEmpty) y
      else if (y.runs.isEmpty) x
      else Buf(x.runs ::: y.runs)

    override def finish(buf: Buf): Option[Out] =
      buf.runs.sortWith((p, q) => lt(p.loTs, p.loId, q.loTs, q.loId))
        .reduceOption(stitch)
        .map { r =>
          // seed s₁ = (firstX, 0): l = m11·x₁ + b1, b = m21·x₁ + b2
          val l = r.m11 * r.firstX + r.b1
          val tr = r.m21 * r.firstX + r.b2
          Out(l, tr, l + 3.0 * tr)
        }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Option[Out]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Out]]()
  }

  /** Column-level UDAF: holt(tsMicros, eventId, value). */
  def udafFor(alpha: Double, gamma: Double)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new Agg(alpha, gamma))
}
