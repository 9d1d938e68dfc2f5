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

/** First 7 UTF-8 bytes of a string packed big-endian into a long (shorter
  * strings zero-pad). UTF-8 byte order preserves code-point order, so the
  * packed longs sort exactly like the strings truncated to 7 bytes — and 7
  * bytes keeps the result non-negative, so no signed-comparison flip. This
  * is what lets string keys ride the numeric quantile machinery
  * ([[QuantileBucket]], `approxQuantile`): Z-ordering and range-bucketing
  * need only ORDER, and a 7-byte prefix carries all the order a
  * write-layout decision can use (ties beyond 7 bytes land in the same
  * bucket — harmless for clustering, which is approximate by design).
  */
case class StringPrefixLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "string_prefix_long"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var r = 0L
    var i = 0
    while (i < 7) {
      r = (r << 8) | (if (i < b.length) (b(i) & 0xffL) else 0L)
      i += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $c.getBytes();
         |long $r = 0L;
         |for (int $i = 0; $i < 7; $i++) {
         |  $r = ($r << 8) | ($i < $b.length ? (long) ($b[$i] & 0xFF) : 0L);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

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

  /** Codegen'd 7-byte UTF-8 prefix of a string as an order-preserving
    * non-negative long. NULL in → NULL out.
    */
  def stringPrefixLong(s: Column): Column =
    ColumnBridge.column(StringPrefixLong(ColumnBridge.expression(s)))
}
