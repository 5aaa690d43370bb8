package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

import graft.ops.LlmOps
import graft.plans.{DotProductRewrite, GraftExtensions}

/** The optimizer extension: the portable HOF dot-product idiom is
  * rewritten to the codegen'd DotProduct with identical results.
  */
class DotProductRewriteSpec extends SparkSuite {

  private val hof =
    "aggregate(zip_with(a_emb, b_emb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  private def pairFrame() = {
    import spark.implicits._
    val e = LlmOps.normed(spark, sf).select($"vec_id", $"emb").limit(20)
    e.select($"vec_id".as("a_id"), $"emb".as("a_emb"))
      .crossJoin(e.select($"emb".as("b_emb")))
  }

  test("rule rewrites the HOF idiom to graft_dot; results identical") {
    val df = pairFrame().withColumn("d", expr(hof))
    val before = df.queryExecution.optimizedPlan.toString
    assert(!before.contains("graft_dot"), "should start as plain HOF")

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      val df2 = pairFrame().withColumn("d", expr(hof))
      val after = df2.queryExecution.optimizedPlan.toString
      assert(after.contains("graft_dot"), s"rewrite did not fire:\n$after")
      // results stay bit-identical (the rewrite preserves sum order)
      val a = df.agg(sum(col("d"))).head().getDouble(0)
      val b = df2.agg(sum(col("d"))).head().getDouble(0)
      assert(a == b)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("rule leaves non-dot aggregates alone") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try {
      // sum of (x + y) is not a dot product — must NOT rewrite
      val df = pairFrame().withColumn("d",
        expr("aggregate(zip_with(a_emb, b_emb, (x, y) -> x + y), 0D, (acc, v) -> acc + v)"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
    }
  }

  test("GraftExtensions installs without error") {
    new GraftExtensions()(new SparkSessionExtensions)
  }
}
