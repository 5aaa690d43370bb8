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

  test("json $.k values stay in the documented 0..99 domain") {
    val r = Scalars.qJsonExtract(spark, sf)
      .agg(min(col("min_k")), max(col("max_k"))).head()
    assert(r.getLong(0) >= 0 && r.getLong(1) <= 99)
  }
}
