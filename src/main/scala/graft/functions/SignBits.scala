package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd sign-LSH band key over an ArrayType(DoubleType) column —
  * the [[Dist2]] treatment applied to the banding folds (VERDICT r14
  * task 3): the HOF form
  *
  *   `aggregate(slice(emb, start, len), 0L,
  *              (acc, x) -> acc * 2 + CASE WHEN x >= 0 THEN 1 ELSE 0 END)`
  *
  * is a CodegenFallback chain that allocates a sliced copy of the
  * vector and interprets a lambda per element — and the LSH keys
  * evaluate it 8 times per row (q_dedup_embed_lsh's 8 bands). This
  * expression emits one fused loop with the IDENTICAL integer
  * arithmetic: bit i is 1 iff element (start−1)+i ≥ 0, packed MSB
  * first (acc = acc·2 + bit, left to right), elements past the end of
  * the array are skipped exactly like `slice` truncates, and a (never
  * occurring on the fixtures) NULL element contributes bit 0 exactly
  * like the HOF's CASE. Pure integer math ⇒ bit-identical to the HOF
  * form and to the oracle's integer recompute by construction;
  * SignBitsSpec pins equality against the HOF on both eval paths.
  *
  * `start` is 1-based like `slice`; `len ≥ 0`.
  */
case class SignBits(child: Expression, start: Int, len: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if start >= 1 && len >= 0 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
        s"graft_signbits requires start >= 1 and len >= 0, got ($start, $len)")
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_signbits requires an array<double> input, got $t")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val end = math.min(start - 1 + len, x.numElements())
    var acc = 0L
    var i = start - 1
    while (i < end) {
      acc = acc * 2 + (if (!x.isNullAt(i) && x.getDouble(i) >= 0) 1L else 0L)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      s"""
         |int $end = java.lang.Math.min(${start - 1} + $len, $a.numElements());
         |long $acc = 0L;
         |for (int $i = ${start - 1}; $i < $end; $i++) {
         |  $acc = $acc * 2L +
         |    ((!$a.isNullAt($i) && $a.getDouble($i) >= 0.0) ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)

  override def prettyName: String = s"graft_signbits_${start}_$len"
}

object SignBits {

  /** Column-level entry point: the sign-bit band key of
    * `emb[start .. start+len-1]` (1-based, slice semantics).
    */
  def signBits(emb: Column, start: Int, len: Int): Column =
    GraftBridge.column(SignBits(GraftBridge.expression(emb), start, len))
}
