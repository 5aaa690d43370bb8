package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4 `transformWithState` processor: running (count, value-sum)
  * per key with explicit typed state — the modern replacement for
  * mapGroupsWithState, backed by the RocksDB state store. Input rows
  * are (key, value-cents) pairs; output is the updated running total
  * per key per micro-batch.
  */
class RunningCountProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)](
      "running", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var (n, sum) = if (state.exists()) state.get() else (0L, 0L)
    rows.foreach { case (_, v) => n += 1; sum += v }
    state.update((n, sum))
    Iterator.single((key, n, sum))
  }
}
