package graft

import org.apache.spark.sql.functions._

import graft.functions.SignBits
import graft.ops.LlmOps

/** r15 optimization pin: the codegen'd sign-LSH band key that
  * replaced the interpreted `aggregate(slice(...))` HOF folds in the
  * LSH family must be BIT-identical to them — band keys are equi-join
  * keys, so any divergence silently changes the candidate set and
  * breaks the DuckDB oracle's integer recompute.
  */
class SignBitsSpec extends SparkSuite {

  test("graft_signbits equals the aggregate(slice(...)) HOF on every band") {
    import spark.implicits._
    val e = LlmOps.normed(spark, sf).select($"emb")
    for ((start, len) <- Seq((1, 8), (9, 8), (17, 3), (33, 16), (1, 0),
        (49, 16), (57, 16))) {
      val cmp = e
        .withColumn("hof", expr(
          s"""aggregate(slice(emb, $start, $len), CAST(0 AS BIGINT),
              (acc, x) -> acc * 2 + CASE WHEN x >= 0 THEN 1 ELSE 0 END)"""))
        .withColumn("fast", SignBits.signBits($"emb", start, len))
      assert(cmp.filter($"hof" =!= $"fast").count() == 0,
        s"mismatch at band ($start, $len)")
    }
  }

  test("slice truncation past the array end matches the HOF") {
    import spark.implicits._
    // 4-element vectors, band asks for (3, 16) — only elements 3..4
    // contribute, exactly like slice's truncation
    val df = Seq(Seq(1.0, -2.0, 3.0, -4.0), Seq(-1.0, 1.0, -1.0, 1.0))
      .toDF("emb")
    val cmp = df
      .withColumn("hof", expr(
        """aggregate(slice(emb, 3, 16), CAST(0 AS BIGINT),
            (acc, x) -> acc * 2 + CASE WHEN x >= 0 THEN 1 ELSE 0 END)"""))
      .withColumn("fast", SignBits.signBits($"emb", 3, 16))
    assert(cmp.filter($"hof" =!= $"fast").count() == 0)
  }

  test("interpreted eval matches the hand-computed fold, incl. -0.0") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // -0.0 >= 0 is TRUE in both the HOF's CASE and the Java compare
    val xs = Array(0.5, -0.0, -3.0, 0.0, -1e-300, 7.0)
    val x = Literal.create(ArrayData.toArrayData(xs), ArrayType(DoubleType))
    val got = SignBits(x, 1, 6).eval(null).asInstanceOf[Long]
    assert(got == java.lang.Long.parseLong("110101", 2))
    assert(SignBits(x, 5, 2).eval(null).asInstanceOf[Long] == 1L)
    assert(SignBits(x, 1, 0).eval(null).asInstanceOf[Long] == 0L)
    assert(SignBits(x, 7, 8).eval(null).asInstanceOf[Long] == 0L)
  }

  test("lsh plan: graft_signbits inlined in the banding Project") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = ops.TrainingOps.qSimAnnLsh(spark, sf)
    ops.core.withCaches(spark) {
      df.count()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val txt = plan.toString
      assert(txt.contains("graft_signbits_"),
        s"graft_signbits not inlined in:\n$txt")
    }
    spark.catalog.clearCache()
  }
}
