package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** J2: native codegen'd Morton (Z-order) interleave of the low 16 bits of
  * two BIGINT columns — `z = … y₁x₁y₀x₀` (x in the even bit positions,
  * y in the odd). Semantically identical to the 2·16-term shift/mask SQL
  * formula (PropertySpec proves the equivalence exhaustively on the
  * 6-bit grid and on random 16-bit inputs), but one tight branch-free
  * loop instead of a 32-operator expression tree — the difference
  * between a layout pass that keeps whole-stage codegen tight and one
  * that spills a page of generated operators per row. Inputs are
  * expected non-negative with the payload in the low 16 bits (quantized
  * dimension indexes); higher bits are ignored by construction.
  */
case class ZOrder(left: Expression, right: Expression) extends BinaryExpression {

  private val bits = 16

  override def dataType: DataType = LongType

  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_zorder expects (bigint, bigint), got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[Long]
    val y = r.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
        long $z = 0L;
        for (int $i = 0; $i < $bits; $i++) {
          $z |= (($x >> $i) & 1L) << (2 * $i) | (($y >> $i) & 1L) << (2 * $i + 1);
        }
        ${ev.value} = $z;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Column-level entry point. */
  def apply(x: Column, y: Column): Column =
    ColumnBridge.column(
      ZOrder(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
