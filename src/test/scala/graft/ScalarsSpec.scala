package graft

import org.apache.spark.sql.functions._

import graft.ops.{Scalars, core}

/** SURVEY §2.8 scalar surface. */
class ScalarsSpec extends SparkSuite {

  // q_ts_anomaly is legitimately EMPTY at sf0.001 (< 20 events per
  // (type, day) cell never clears the warm-up) — it gets a dedicated
  // sf0.01 test below instead of the rows>0 sweep.
  for ((name, fn) <- Scalars.queries if name != "q_ts_anomaly") {
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("q_ts_interp: identity on live readings, bounded lerp on dropped ones") {
    import spark.implicits._
    // sf0.1 is the fixture that actually contains dropped (value=0)
    // readings — the interpolation branch must be exercised
    val df = Scalars.qTsInterp(spark, "/root/testdata/sf0.1").cache()
    try {
      assert(df.filter($"v_c" =!= 0L &&
        $"v_interp" =!= $"v_c".cast("double")).count() == 0)
      val dropped = df.filter($"v_c" === 0L)
      assert(dropped.count() > 0)
      // an interpolated value can never leave the fixture value range
      assert(dropped.filter($"v_interp" < 0.0 ||
        $"v_interp" > 60000.0).count() == 0)
    } finally df.unpersist()
  }

  test("q_ts_anomaly: empty at sf0.001; sf0.01 flags only warmed-up 3σ rows") {
    assert(Scalars.qTsAnomaly(spark, sf).count() == 0)
    val rows = Scalars.qTsAnomaly(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_prev") >= 20)
      // the gate is the exact integer z² > 9 comparison; the reported
      // r4-rounded z can land exactly on 3.0 but never below
      assert(math.abs(r.getAs[Double]("z")) >= 3.0)
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
