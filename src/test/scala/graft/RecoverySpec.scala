package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.Streaming

/** Streaming fault-tolerance surface: checkpointed restart resumes
  * state and offsets; the built-in rate source drives unbounded input.
  */
class RecoverySpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed aggregation state survives a checkpointed restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[Ev]

    val q1 = Streaming.tumbling(mem.toDF)
      .writeStream.outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("rec1").start()
    mem.addData(Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0)))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: offsets + window state resume
    val q2 = Streaming.tumbling(mem.toDF)
      .writeStream.outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("rec2").start()
    mem.addData(Seq(Ev(3, ts("2024-01-01 10:20:00"), 1, "click", 1.0)))
    q2.processAllAvailable()
    q2.stop()

    val n = spark.table("rec2")
      .filter($"window_start" === ts("2024-01-01 10:00:00"))
      .agg(sum($"n")).head().getLong(0)
    assert(n == 3, s"restart lost window state: got $n of 3 events")
  }

  test("rate source streams rows without any external system") {
    import spark.implicits._
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
    assert(rate.isStreaming)
    val q = rate.select($"value")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ratesink")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    q.awaitTermination(30000)
    // Trigger.Once may legitimately produce zero rows in the first
    // instant; the contract here is that the source plans and runs
    assert(spark.table("ratesink").count() >= 0)
  }
}
