package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.{MGSummary, MisraGries}

/** Streaming Misra–Gries: the bounded-state heavy-hitters sketch as a
  * Spark 4 `transformWithState` processor, sharded by item (key =
  * item's shard id; every occurrence of an item lands on ONE shard).
  * Each shard maintains its own capacity-k MG summary in typed state
  * — O(k) bytes per shard forever, regardless of stream length — and
  * emits its full summary each micro-batch (Update mode: downstream
  * reads the latest row per shard).
  *
  * Sharding by item keeps the classic guarantee: an item with global
  * frequency > n/(k+1) has shard frequency > n_shard/(k+1) (all its
  * occurrences share the shard and n_shard ≤ n), so it survives in
  * its shard's summary, and the union of shard summaries is a
  * candidate superset — exactly what the batch key's pass 2 needs.
  * StreamingHeavyHittersSpec pins the end-to-end contract: streamed
  * sketch → union candidates → exact recount ≡ the registered
  * q_agg_heavyhitters batch output.
  *
  * Input rows are (shard, item); output is (shard, seq, items,
  * counters, err) with items/counters as parallel arrays (flat state
  * row) and seq a strictly-increasing per-shard batch counter so a
  * consumer can pick each shard's LATEST summary from an update-mode
  * sink without relying on err ties.
  */
class MisraGriesProcessor(k: Int)
    extends StatefulProcessor[Int, (Int, String), (Int, Long, Array[String], Array[Long], Long)] {

  @transient private var state
    : ValueState[(Long, Array[String], Array[Long], Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Array[String], Array[Long], Long)](
      "mg", ExpressionEncoder[(Long, Array[String], Array[Long], Long)](),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Int, rows: Iterator[(Int, String)],
      timerValues: TimerValues): Iterator[(Int, Long, Array[String], Array[Long], Long)] = {
    val mg = new MisraGries(k)
    var seq = 0L
    var b =
      if (state.exists()) {
        val (s0, items, counts, err) = state.get()
        seq = s0
        MGSummary(mutable.Map(items.zip(counts).toSeq: _*), err)
      } else mg.zero
    rows.foreach { case (_, item) => b = mg.reduce(b, item) }
    val (items, counts) = b.counts.toArray.sortBy(_._1).unzip
    state.update((seq + 1, items, counts, b.err))
    Iterator.single((key, seq + 1, items, counts, b.err))
  }
}
