package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd squared-L2 distance over two ArrayType(DoubleType)
  * columns — the [[DotProduct]] treatment applied to the OTHER
  * order-identical fold the similarity/clustering family ranks on.
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x,y) ->
  * (x-y)*(x-y)), 0D, (acc,v) -> acc+v)` is a CodegenFallback chain:
  * it allocates an intermediate array and interprets two lambdas per
  * row, which dominates the candidate-scoring loops of q_ml_kmeans /
  * q_embed_pq / q_sim_ann_pq / q_dedup_semantic (n·k distance rows
  * per Lloyd pass). This expression emits one fused loop inside
  * whole-stage codegen with the SAME per-element arithmetic
  * (d = x−y; acc = acc + d·d, left to right), so every intermediate
  * double is IEEE-identical to the HOF form and to DuckDB's
  * sequential `list_reduce` oracle — Dist2Spec pins bit-equality on
  * fixture and adversarial vectors, interpreted AND codegen paths.
  */
case class Dist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dist2 requires two array<double> inputs, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dist2"
}

object Dist2 {

  /** Register `graft_dist2` in the session's function registry
    * (idempotent) — the [[DotProduct.register]] pattern.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dist2", exprs => Dist2(exprs(0), exprs(1)), "scala_udf")

  /** Column-level entry point. */
  def dist2(a: Column, b: Column): Column =
    GraftBridge.column(
      Dist2(GraftBridge.expression(a), GraftBridge.expression(b)))
}
