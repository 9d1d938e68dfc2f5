package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, NfcNormalize, StripAccents}

/** SparkSessionExtensions installer: makes graft's native expressions
  * available to SQL-text users (`SELECT vec_dot(a, b) …`,
  * `strip_accents(s)`, `nfc_normalize(s)`) — activate with
  * `.withExtensions(new GraftExtensions)` on the builder, or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * The DataFrame API reaches the same expressions through
  * [[graft.functions.VectorExprs]] / [[graft.functions.TextExprs]] without
  * any registration.
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
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot requires exactly 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
    unary("strip_accents", classOf[StripAccents], StripAccents(_))
    unary("nfc_normalize", classOf[NfcNormalize], NfcNormalize(_))
  }
}
