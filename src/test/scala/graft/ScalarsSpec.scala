package graft

import org.apache.spark.sql.functions._

import graft.ops.{Scalars, core}

/** SURVEY §2.8 scalar surface. */
class ScalarsSpec extends SparkSuite {

  for ((name, fn) <- Scalars.queries) {
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("pivot counts sum back to total event count") {
    import spark.implicits._
    val total = core.t(spark, sf, "events").count()
    val p = Scalars.qPivot(spark, sf)
    val summed = p.select(
      (col("click") + col("error") + col("purchase") + col("signup") +
        col("view")).as("s"))
      .agg(sum($"s")).head().getLong(0)
    assert(summed == total)
  }

  test("unpivot is the inverse of pivot (5 rows per user)") {
    val p = Scalars.qPivot(spark, sf).count()
    val u = Scalars.qUnpivot(spark, sf).count()
    assert(u == p * 5)
  }

  test("explode row count equals total token count") {
    val tokens = Scalars.qStrSplit(spark, sf)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(Scalars.qExplode(spark, sf).count() == tokens)
  }

  test("ohlc: same-ts ties break by event_id; bar boundary at :15:00") {
    import spark.implicits._
    val rows = Seq(
      // two events at the IDENTICAL timestamp — open must take
      // event_id 1, close event_id 2, regardless of value order
      (1L, "2024-01-01 10:03:00", "click", 9.00),
      (2L, "2024-01-01 10:03:00", "click", 3.00),
      (3L, "2024-01-01 10:14:59", "click", 5.00),
      // exactly on the boundary -> the NEXT bar
      (4L, "2024-01-01 10:15:00", "click", 7.00))
      .toDF("event_id", "ts_s", "event_type", "value")
      .select($"event_id", to_timestamp($"ts_s").as("ts"),
        $"event_type", $"value")
    val out = Scalars.ohlc(rows).orderBy($"bar_start")
      .select($"n", $"open_c", $"high_c", $"low_c", $"close_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((3L, 900L, 900L, 300L, 500L),
      (1L, 700L, 700L, 700L, 700L)))
  }

  test("json $.k values stay in the documented 0..99 domain") {
    val r = Scalars.qJsonExtract(spark, sf)
      .agg(min(col("min_k")), max(col("max_k"))).head()
    assert(r.getLong(0) >= 0 && r.getLong(1) <= 99)
  }
}
