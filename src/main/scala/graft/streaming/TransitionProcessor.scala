package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming analog of [[graft.ops.Streaming.transitions]]: per-user
  * typed state holds the LAST seen event (ts µs, type); each new
  * event emits one (from_type, to_type, gap_us) transition and
  * advances the state — so the transition matrix accumulates
  * incrementally with O(1) state per user instead of a batch lead
  * window. Rows within a micro-batch are sorted by (ts, event_id)
  * before folding; cross-batch ordering is the source's contract
  * (event logs replay in order), same assumption the batch window
  * makes globally — which is why event_id need not persist in state:
  * it only ever tiebreaks WITHIN a batch.
  *
  * Input: (user_id, ts_us, event_id, event_type).
  * Output: (from_type, to_type, gap_us).
  */
class TransitionProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, String), (String, String, Long)] {

  @transient private var last: ValueState[(Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[(Long, String)](
      "last",
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Long, Long, String)],
      timerValues: TimerValues): Iterator[(String, String, Long)] = {
    val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
    val out = Seq.newBuilder[(String, String, Long)]
    var prev = if (last.exists()) Some(last.get()) else None
    sorted.foreach { case (_, tsUs, _, tp) =>
      prev.foreach { case (pTs, pTp) => out += ((pTp, tp, tsUs - pTs)) }
      prev = Some((tsUs, tp))
    }
    prev.foreach(last.update)
    out.result().iterator
  }
}
