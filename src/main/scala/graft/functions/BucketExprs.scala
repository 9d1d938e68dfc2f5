package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for broadcast-boundary bucketing: map a
  * double to the index of the quantile bucket it falls in, by binary
  * search over a small sorted boundary array shipped with the plan.
  *
  * This is the scale-safe replacement for rank compression via
  * `ntile(n) OVER (ORDER BY key)`: the global window moves the entire
  * dataset through ONE task to assign ordinals, while this expression
  * assigns them row-local from precomputed approx-quantile boundaries —
  * no shuffle, no sort, O(log buckets) per row inside whole-stage
  * codegen. The boundary array (at most a few thousand doubles) rides
  * along as a plan reference object, the same mechanism a broadcast
  * literal uses.
  *
  * Bucket semantics: `boundaries` are the interior cut points
  * b₀ ≤ b₁ ≤ … ≤ bₖ₋₁; a value v maps to the number of boundaries < v
  * (values exactly equal to a boundary land in the upper bucket), so
  * ordinals span 0..k. Callers pass DISTINCT boundaries — with
  * duplicates, `Arrays.binarySearch` may return any matching index and
  * the ordinal for boundary-equal values would be nondeterministic.
  */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantile_bucket"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any = {
    val idx = java.util.Arrays.binarySearch(boundaries,
      v.asInstanceOf[Double])
    (if (idx >= 0) idx + 1 else -idx - 1).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val b = ctx.addReferenceObj("boundaries", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = java.util.Arrays.binarySearch($b, $c);
         |${ev.value} = ($idx >= 0) ? (long) ($idx + 1) : (long) (-$idx - 1);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BucketExprs {
  /** Codegen'd bucket index of `v` (cast to double) against sorted,
    * distinct `boundaries`. NULL in → NULL out.
    */
  def quantileBucket(v: Column, boundaries: Array[Double]): Column =
    ColumnBridge.column(QuantileBucket(
      ColumnBridge.expression(v.cast("double")), boundaries))
}
