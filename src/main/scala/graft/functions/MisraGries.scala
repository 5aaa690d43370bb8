package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS '12).
  *
  * State is HARD-BOUNDED at k (item, counter) pairs per partial, so a
  * global aggregation over 100 TB carries O(k) bytes per task and one
  * O(k) merge per partition — the bounded-memory alternative to an
  * exact group-by when only the heavy tail matters. Guarantees, for
  * ANY arrival/merge order over n items:
  *
  *  - every item with true frequency  > n/(k+1) is in the summary;
  *  - each kept counter undercounts its true frequency by ≤ n/(k+1)
  *    (tracked exactly per-summary in `err`, the total decrement).
  *
  * Which BORDERLINE items survive (and the counter values) are
  * order-dependent, so a summary is candidate generation, not an
  * answer: pipelines recount candidates exactly (broadcast semi-join,
  * one combinable group-by over candidate rows only) and threshold on
  * the recount — that two-pass result is deterministic and exact.
  * The fixture corpus is deliberately near-uniform (no bigram exceeds
  * 0.2 %), so the registered key `q_agg_heavyhitters` (r8) derives
  * its own deterministic skewed item universe from the events table
  * and runs this sketch as pass 1 of an exact two-pass (candidates →
  * broadcast recount → threshold); the streaming twin
  * (MisraGriesProcessor / StreamingHeavyHittersSpec) reduces through
  * the same logic in typed state. MisraGriesSpec additionally pins
  * the guarantees on synthetic Zipf data, and ScaleProbe runs the
  * sketch over 5M rows.
  */
case class MGSummary(counts: mutable.Map[String, Long], err: Long)

class MisraGries(k: Int)
    extends Aggregator[String, MGSummary, Map[String, Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: MGSummary = MGSummary(mutable.Map.empty, 0L)

  override def reduce(b: MGSummary, item: String): MGSummary = {
    val m = b.counts
    m.get(item) match {
      case Some(c) => m(item) = c + 1; b
      case None if m.size < k => m(item) = 1L; b
      case None =>
        // classic decrement-all step: the new item and one unit of
        // every kept counter annihilate (k+1 distinct items, one
        // count each, cannot all be heavy)
        val dead = m.iterator.collect { case (key, 1L) => key }.toList
        m.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(m -= _)
        MGSummary(m, b.err + 1)
    }
  }

  override def merge(x: MGSummary, y: MGSummary): MGSummary = {
    val m = x.counts
    y.counts.foreach { case (key, c) => m(key) = m.getOrElse(key, 0L) + c }
    if (m.size <= k) MGSummary(m, x.err + y.err)
    else {
      // subtract the (k+1)-th largest counter from all and keep the
      // positive remainder — the PODS '12 merge that preserves both
      // guarantees with error the SUM of the inputs' errors
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = m.iterator.collect { case (key, c) if c <= cut => key }.toList
      m.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(m -= _)
      MGSummary(m, x.err + y.err + cut)
    }
  }

  override def finish(r: MGSummary): Map[String, Long] = r.counts.toMap

  override def bufferEncoder: Encoder[MGSummary] = Encoders.kryo[MGSummary]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
