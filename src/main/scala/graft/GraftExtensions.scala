package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType}

import graft.functions.{BloomMightContainLong, DotProduct, NfcNormalize,
  QuantileBucket, StripAccents}

/** SparkSessionExtensions installer: makes ALL FIVE of graft's native
  * expressions available to SQL-text users (`SELECT vec_dot(a, b) …`,
  * `strip_accents(s)`, `nfc_normalize(s)`,
  * `bloom_might_contain(x, <binary filter>)`,
  * `quantile_bucket(v, array(...))`) — activate with
  * `.withExtensions(new GraftExtensions)` on the builder, or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * The DataFrame API reaches the same expressions through
  * [[graft.functions.VectorExprs]] / [[graft.functions.TextExprs]] /
  * [[graft.functions.BloomExprs]] / [[graft.functions.BucketExprs]]
  * without any registration.
  *
  * bloom_might_contain / quantile_bucket carry driver-side constant state
  * (the serialized filter / the boundary grid), so their second SQL
  * argument must be FOLDABLE — it is evaluated once at plan time, exactly
  * like the DataFrame API's constructor argument, never per row.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def unary(name: String, clazz: Class[_],
        build: Expression => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(children.size == 1,
            s"$name requires exactly 1 argument, got ${children.size}")
          build(children.head)
        }))
    def binaryWithConst(name: String, clazz: Class[_],
        build: (Expression, Expression) => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(children.size == 2,
            s"$name requires exactly 2 arguments, got ${children.size}")
          build(children.head, children(1))
        }))
    binaryWithConst("vec_dot", classOf[DotProduct], DotProduct(_, _))
    unary("strip_accents", classOf[StripAccents], StripAccents(_))
    unary("nfc_normalize", classOf[NfcNormalize], NfcNormalize(_))
    binaryWithConst("bloom_might_contain", classOf[BloomMightContainLong],
      (x, filt) => {
        require(filt.foldable && filt.dataType == BinaryType,
          "bloom_might_contain's 2nd argument must be a foldable BINARY " +
            "value (the serialized bloom filter)")
        val bytes = filt.eval(null).asInstanceOf[Array[Byte]]
        require(bytes != null, "bloom filter must not be NULL")
        BloomMightContainLong(x, bytes)
      })
    binaryWithConst("quantile_bucket", classOf[QuantileBucket],
      (v, bounds) => {
        val ok = bounds.foldable && (bounds.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
        require(ok, "quantile_bucket's 2nd argument must be a foldable " +
          "ARRAY<DOUBLE> (the frozen boundary grid)")
        val arr = bounds.eval(null).asInstanceOf[ArrayData]
        require(arr != null, "boundary grid must not be NULL")
        // binarySearch preconditions: no null elements (toDoubleArray NPEs
        // unhelpfully at plan time) and strictly ascending order (an unsorted
        // grid silently returns wrong buckets).
        require(!(0 until arr.numElements()).exists(arr.isNullAt),
          "boundary grid must not contain NULL elements")
        val grid = arr.toDoubleArray()
        require(grid.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
          "boundary grid must be strictly ascending")
        QuantileBucket(v, grid)
      })
  }
}
