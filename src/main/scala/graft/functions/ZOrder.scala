package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 16+16-bit Morton (Z-order) interleave: the data-layout
  * key behind multi-dimensional file clustering (Delta/Iceberg
  * `ZORDER BY` — public knowledge; the curve itself is Morton 1966).
  * Writing a 100 TB table sorted by `graft_zorder(dim1, dim2)` makes
  * files range-prunable on EITHER dimension, where a lexicographic
  * sort prunes only the leading one.
  *
  * Takes the low 16 bits of each (long) input; x occupies even bits,
  * y odd bits, so the result is a 32-bit non-negative long — safely
  * inside BIGINT on every engine, which keeps the DuckDB oracle an
  * exact shift/mask-arithmetic mirror (no sign traps: every
  * intermediate stays positive).
  *
  * The bit-spreading uses the classic magic-mask doubling scheme
  * (5 shift/mask steps instead of a 16-step bit loop); `nullSafeEval`
  * and the generated code share the identical constants, and the
  * whole computation is exact integer arithmetic — deterministic by
  * construction.
  */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires two bigint inputs, got $l and $r")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_zorder"
}

object ZOrder {

  /** Spread the low 16 bits of v across the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** The Morton code: x on even bits, y on odd bits — static so the
    * generated code calls one branch-free method (JIT-inlined).
    */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** Register `graft_zorder` in the session's function registry
    * (idempotent), mirroring [[DotProduct.register]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder", exprs => ZOrder(exprs(0), exprs(1)), "scala_udf")

  /** Column-level entry point. */
  def zorder(a: Column, b: Column): Column =
    GraftBridge.column(
      ZOrder(GraftBridge.expression(a), GraftBridge.expression(b)))
}
