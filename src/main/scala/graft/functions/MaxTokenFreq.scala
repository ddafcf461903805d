package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** J2: native codegen'd maximum token frequency over a string array —
  * one hash-counting pass per row, the linear-time core of the Gopher
  * top-word repetition signal. The naive SQL form,
  * `transform(array_distinct(toks), w -> size(filter(toks, …)))`, costs
  * O(|distinct|·n) INTERPRETED lambda evals per document (HOF lambdas
  * never codegen — the r6 finding that motivated this operator: ~500k
  * evals/row on a real web document), and even the sorted-run rewrite
  * drags a lambda comparator in through `array_sort`, which knocks the
  * whole projection out of codegen. This Expression needs neither sort
  * nor lambda: O(n) UTF8String hash-map counting inside whole-stage
  * codegen (PlanSpec asserts the span; PropertySpec proves equality
  * against the interpreted HOF definition).
  *
  * Null elements are ignored (they are not tokens); empty or all-null
  * array → 0; null array → null.
  */
case class MaxTokenFreq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_max_token_freq expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val cur = arr.getUTF8String(i)
        val prev = counts.get(cur)
        val next = if (prev == null) 1 else prev + 1
        counts.put(cur, next)
        if (next > best) best = next
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val best = ctx.freshName("best")
      val cur = ctx.freshName("cur")
      val prev = ctx.freshName("prev")
      val next = ctx.freshName("next")
      val i = ctx.freshName("i")
      val utf8 = classOf[UTF8String].getName
      // raw-typed HashMap: janino's generics support is not to be relied on
      s"""
        final int $n = $c.numElements();
        java.util.HashMap $counts = new java.util.HashMap();
        int $best = 0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$c.isNullAt($i)) {
            $utf8 $cur = $c.getUTF8String($i);
            Object $prev = $counts.get($cur);
            int $next = $prev == null ? 1 : ((Integer) $prev).intValue() + 1;
            $counts.put($cur, Integer.valueOf($next));
            if ($next > $best) $best = $next;
          }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxTokenFreq {
  /** Column-level entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(MaxTokenFreq(ColumnBridge.expression(c)))
}
