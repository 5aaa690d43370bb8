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

  // Dedicated session (ADVICE r8): StreamBench toggles session confs
  // (noDataMicroBatches, the RocksDB provider) for seconds at a time,
  // and sbt runs suites concurrently in one JVM — a concurrently
  // running streaming suite that relies on the eager no-data-batch
  // default could start a query mid-toggle and stall. newSession()
  // shares the SparkContext but owns an isolated SQLConf (inheriting
  // the builder confs, which live in the SparkContext conf), so the
  // toggles are invisible to every other suite.
  private lazy val bench: org.apache.spark.sql.SparkSession =
    spark.newSession()

  private lazy val events = StreamBench.orderedEvents(400000)

  // one-time codegen/state-store classload, exactly like the main's
  // warm pass — the floor is about steady-state, not first-query cost
  private lazy val warm: Unit = {
    val w = StreamBench.orderedEvents(20000)
    StreamBench.pipelines.foreach { case (_, fn) => fn(bench, w, w.length) }
  }

  /** Floor with one retry: the documented external host steal
    * (CLAUDE.md r6 — invisible neighbors inflate every measurement
    * 1.5–2× for minutes) can push a single run under a floor that
    * steady-state clears 2–3×; equivalence must hold on EVERY run,
    * but the throughput assertion takes the best of two so one
    * contention burst can't fail an unrelated CI run. A structural
    * regression (complete-mode sink, state blowup) slows BOTH runs.
    */
  private def floored(floor: Double, label: String)(
      run: => StreamBench.PipeResult): StreamBench.PipeResult = {
    val r1 = run
    assert(r1.matchesBatch, s"$label diverged from its batch twin")
    if (r1.rowsPerSec >= floor) r1
    else {
      val r2 = run
      assert(r2.matchesBatch, s"$label diverged from its batch twin (retry)")
      assert(math.max(r1.rowsPerSec, r2.rowsPerSec) >= floor,
        f"$label ${r1.rowsPerSec}%.0f and retry ${r2.rowsPerSec}%.0f " +
          f"rows/s both under the $floor%.0f floor")
      r2
    }
  }

  test("windowed agg streams >= 50k events/s at local[4] and matches batch") {
    warm
    floored(50000, "windowed agg") {
      StreamBench.benchWindowedAgg(bench, events, 100000)
    }
  }

  test("stream-stream interval join matches batch and holds >= 20k events/s") {
    warm
    floored(20000, "interval join") {
      StreamBench.benchIntervalJoin(bench, events, 100000)
    }
  }

  test("session windows match batch and hold >= 20k events/s") {
    warm
    floored(20000, "session window") {
      StreamBench.benchSessionWindow(bench, events, 100000)
    }
  }

  test("streaming dedup keeps the dedup contract and holds >= 30k events/s") {
    warm
    // matchesBatch here is the dedup CONTRACT (one emission per key,
    // key set equality, emitted row ∈ its input group) — bitwise rows
    // are partition-race nondeterministic under a parallel feed
    floored(30000, "streaming dedup") {
      StreamBench.benchStreamingDedup(bench, events, 100000)
    }
  }

  test("transformWithState running count matches batch and holds >= 50k events/s") {
    warm
    floored(50000, "stateful count") {
      StreamBench.benchStatefulCount(bench, events, 100000)
    }
  }

  test("streaming heavy hitters matches its batch recount and holds >= 20k events/s") {
    warm
    floored(20000, "heavy hitters") {
      StreamBench.benchHeavyHitters(bench, events, 100000)
    }
  }

  test("state-scale probe: state rows == keys, distributed equivalence holds") {
    warm
    val r = StreamBench.benchStateScale(bench, 200000, 50000)
    assert(r.matchesBatch, "state-scale streamed finals diverged from batch")
    assert(r.stateRows == 200000L,
      s"state store reports ${r.stateRows} rows for 200000 keys")
  }

  test("recovery probe: restarted totals are exactly-once") {
    warm
    val r = StreamBench.benchRecovery(bench, 100000, 50000)
    assert(r.matchesBatch,
      "post-restart totals diverged from the batch group-by (lost or " +
        "double-processed batch)")
    assert(r.stateRows == 100000L,
      s"phase-A state rows ${r.stateRows} != 100000 keys")
    assert(r.recoveryFirstBatchMs > 0)
  }

  test("txlog drain: live source-to-sink loop is exact end to end") {
    val r = StreamBench.benchTxLogDrain(bench, 100000, 25000)
    assert(r.exact,
      "the drained txlog table diverged from the source frame")
    assert(r.rows == 100000L && r.srcCommits == 4L && r.fedRows == 75000L)
  }

  test("partitioned txlog drain: the sink's declared spec lands and " +
       "every partition serves exactly through pruned reads") {
    val r = StreamBench.benchTxLogDrainPartitioned(bench, 100000, 25000)
    assert(r.exact,
      "a partition-pruned replica read diverged from the source")
    assert(r.rows == 100000L && r.srcCommits == 4L && r.fedRows == 75000L)
  }

  test("cdc replicate: the replica is exactly the source after a " +
       "mixed append/upsert/delete run") {
    val r = StreamBench.benchCdcReplicate(bench, 30000, 5000)
    assert(r.exact,
      "the CDC replica diverged from the source frame")
    assert(r.srcCommits == 6L, s"2 rounds x 3 commits: ${r.srcCommits}")
    // per round: chunk inserts + chunk/2 update pairs + chunk/10
    // deletes = 5000 + 2*2500 + 500 change rows
    assert(r.changeRows == 2L * (5000L + 5000L + 500L),
      s"change-row accounting drifted: ${r.changeRows}")
  }
}
