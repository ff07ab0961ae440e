package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary [Misra & Gries 1982] as a typed
  * `Aggregator[IN, BUF, OUT]` — the custom-Aggregator leg of the
  * sketch family (HLL / t-digest / Count-Min / Bloom are engine
  * builtins; the frequent-items summary is not, and it is the
  * canonical DETERMINISTIC-guarantee sketch: with k counters, after
  * processing n items,
  *
  *   - every item with true frequency  > n/(k+1) is IN the summary,
  *   - every surviving counter satisfies
  *       true − n/(k+1) ≤ counter ≤ true.
  *
  * Both bounds are worst-case, not probabilistic — which is why the
  * mg1 audit can hash-oracle literal TRUE booleans the way cms1 does.
  *
  * Distribution: partial summaries MERGE by counter addition followed
  * by the (k+1)-th-largest subtraction [Agarwal et al., Mergeable
  * Summaries, PODS '12], preserving the n/(k+1) bound — so the
  * aggregator is partial+final by construction and the shuffled state
  * is ≤ k counters per partition, never a vocabulary histogram. The
  * reduce-side miss path costs O(k) map rebuild; k is a small fixed
  * constant (the summary's whole point), so per-row cost is bounded
  * and independent of corpus size.
  */
object MisraGries {

  /** counters: surviving (item → lower-bound count); processed: total
    * items folded in (the n of the guarantee).
    */
  case class MGSummary(counters: Map[String, Long], processed: Long)

  class MGAgg(k: Int) extends Aggregator[String, MGSummary, MGSummary] {
    require(k >= 1, s"a $k-counter summary holds nothing")

    override def zero: MGSummary = MGSummary(Map.empty, 0L)

    override def reduce(b: MGSummary, t: String): MGSummary = {
      val c = b.counters
      val next =
        if (c.contains(t)) c.updated(t, c(t) + 1L)
        else if (c.size < k) c.updated(t, 1L)
        else
          // classic decrement-all: the miss pays one unit of every
          // counter; zeros drop, freeing slots for later items
          c.flatMap { case (key, v) =>
            if (v > 1L) Some(key -> (v - 1L)) else None
          }
      MGSummary(next, b.processed + 1L)
    }

    override def merge(a: MGSummary, b: MGSummary): MGSummary = {
      val summed = (a.counters.keySet ++ b.counters.keySet).iterator
        .map(key => key -> (a.counters.getOrElse(key, 0L) +
          b.counters.getOrElse(key, 0L)))
        .toMap
      val trimmed =
        if (summed.size <= k) summed
        else {
          // subtract the (k+1)-th largest count from everything and
          // drop non-positives — the PODS'12 mergeable-summary step
          val kth = summed.values.toIndexedSeq
            .sorted(Ordering[Long].reverse)(k)
          summed.flatMap { case (key, v) =>
            if (v - kth > 0L) Some(key -> (v - kth)) else None
          }
        }
      MGSummary(trimmed, a.processed + b.processed)
    }

    override def finish(r: MGSummary): MGSummary = r

    override def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
    override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  }
}
