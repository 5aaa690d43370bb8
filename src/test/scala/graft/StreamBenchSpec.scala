package graft

/** Floors for the measured streaming pipelines (VERDICT r7 task 1).
  * Each StreamBench pipeline ends with an EXACT batch-equivalence
  * check (streamed results == the same transform in batch mode over
  * the same rows) — these tests assert that check at spec scale plus
  * a disaster-floor on throughput. The floor is deliberately ~2-3×
  * under the measured steady-state (STREAMBENCH.json: ~100-190 k
  * rows/s at local[4] even at host load ~2.5): it exists to catch
  * structural regressions (an accidental complete-mode sink, state
  * blowup, a lost source partition, quadratic join state), not to
  * re-measure throughput under CI host noise.
  */
class StreamBenchSpec extends SparkSuite {

  private lazy val events = StreamBench.orderedEvents(400000)

  // one-time codegen/state-store classload, exactly like the main's
  // warm pass — the floor is about steady-state, not first-query cost
  private lazy val warm: Unit = {
    val w = StreamBench.orderedEvents(20000)
    StreamBench.pipelines.foreach { case (_, fn) => fn(spark, w, w.length) }
  }

  test("windowed agg streams >= 50k events/s at local[4] and matches batch") {
    warm
    val r = StreamBench.benchWindowedAgg(spark, events, 100000)
    assert(r.matchesBatch,
      "streaming windowed agg diverged from its batch twin")
    assert(r.rowsPerSec >= 50000,
      f"windowed agg ${r.rowsPerSec}%.0f rows/s under the 50k floor")
  }

  test("stream-stream interval join matches batch and holds >= 20k events/s") {
    warm
    val r = StreamBench.benchIntervalJoin(spark, events, 100000)
    assert(r.matchesBatch,
      "streaming interval join diverged from its batch twin")
    assert(r.rowsPerSec >= 20000,
      f"interval join ${r.rowsPerSec}%.0f rows/s under the 20k floor")
  }

  test("transformWithState running count matches batch and holds >= 50k events/s") {
    warm
    val r = StreamBench.benchStatefulCount(spark, events, 100000)
    assert(r.matchesBatch,
      "transformWithState running totals diverged from batch groupBy")
    assert(r.rowsPerSec >= 50000,
      f"stateful count ${r.rowsPerSec}%.0f rows/s under the 50k floor")
  }
}
