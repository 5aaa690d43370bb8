package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream interval join: two unbounded inputs joined on key +
  * event-time bound, with watermarks sizing the join state. The
  * canonical "purchase within 10 minutes of a click" attribution.
  */
class StreamStreamJoinSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("purchases join clicks of the same user within 10 minutes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]

    val c = clicks.toDF
      .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    val p = purchases.toDF
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      .withWatermark("p_ts", "30 minutes")

    val joined = p.join(c,
      $"p_user" === $"c_user" &&
        $"c_ts" <= $"p_ts" && $"c_ts" >= $"p_ts" - expr("INTERVAL 10 MINUTES"))

    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssjoin").start()

    clicks.addData(Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:30:00"), 1, "click", 1.0),
      Ev(3, ts("2024-01-01 10:00:00"), 2, "click", 1.0)))
    purchases.addData(Seq(
      Ev(10, ts("2024-01-01 10:05:00"), 1, "purchase", 5.0), // joins click 1
      Ev(11, ts("2024-01-01 10:38:00"), 1, "purchase", 5.0), // joins click 2 (not 1: >10m)
      Ev(12, ts("2024-01-01 12:00:00"), 2, "purchase", 5.0))) // no click in window
    q.processAllAvailable()
    // advance both watermarks so all joinable pairs are emitted
    clicks.addData(Seq(Ev(4, ts("2024-01-01 14:00:00"), 9, "click", 1.0)))
    purchases.addData(Seq(Ev(13, ts("2024-01-01 14:00:00"), 9, "purchase", 1.0)))
    q.processAllAvailable(); q.stop()

    val got = spark.table("ssjoin")
      .select($"p_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((10L, 1L)), "purchase 10 must match click 1")
    assert(got.contains((11L, 2L)), "purchase 11 must match click 2")
    assert(!got.contains((11L, 1L)), "purchase 11 is >10m after click 1")
    assert(!got.exists(_._1 == 12L), "purchase 12 has no click in window")
  }
}
