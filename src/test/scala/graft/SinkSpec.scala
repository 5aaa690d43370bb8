package graft

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.ops.Streaming

/** Output surfaces: foreachBatch (the programmable sink), the
  * AvailableNow trigger (bounded drain of an unbounded source), and
  * golden values pinning flagship aggregates against regressions.
  */
class SinkSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("foreachBatch receives every micro-batch with its id") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = SinkSpec.batches
    seen.clear()
    val mem = MemoryStream[Ev]
    val q = Streaming.tumbling(mem.toDF)
      .writeStream.outputMode(OutputMode.Complete())
      .foreachBatch { (df: DataFrame, id: Long) =>
        seen.add(id -> df.agg(coalesce(sum($"n"), lit(0L))).head().getLong(0))
        ()
      }
      .start()
    mem.addData(Seq(Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)))
    q.processAllAvailable()
    mem.addData(Seq(Ev(2, ts("2024-01-01 10:05:00"), 1, "view", 1.0)))
    q.processAllAvailable(); q.stop()
    val byId = seen.toArray(Array.empty[(Long, Long)]).toMap
    assert(byId.keySet.contains(0L) && byId.keySet.exists(_ > 0L))
    assert(byId.values.max == 2L, s"complete-mode totals should reach 2: $byId")
  }

  test("AvailableNow trigger drains the source then stops on its own") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData((1 to 20).map(i =>
      Ev(i.toLong, ts(f"2024-01-01 10:${i % 60}%02d:00"), 1, "click", 1.0)))
    val q = mem.toDF.select($"event_id")
      .writeStream.outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .format("memory").queryName("availnow").start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow query must self-terminate")
    assert(spark.table("availnow").count() == 20)
  }

  test("golden values: flagship Q1 aggregates at sf0.001 are pinned") {
    val rows = graft.ops.Relational.qAggGroupby(spark, sf).collect()
    assert(rows.length == 6)
    val af = rows.find(r => r.getString(0) == "A" && r.getString(1) == "F").get
    assert(af.getLong(2) == 510L, "count_order(A,F)")
    assert(af.getLong(3) == 1309600L, "sum_qty_c(A,F)")
    assert(af.getLong(4) == 2673189014L, "sum_base_price_c(A,F)")
  }

  test("golden values: wordcount vocabulary is exactly 31 terms") {
    assert(graft.ops.LlmOps.qTextWordcount(spark, sf).count() == 31)
  }
}

object SinkSpec {
  // static so the foreachBatch closure doesn't capture the suite
  val batches = new ConcurrentLinkedQueue[(Long, Long)]()
}
