package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** SparkSessionExtensions installer: makes graft's native expressions
  * available to SQL-text users (`SELECT vec_dot(a, b) …`) — activate with
  * `.withExtensions(new GraftExtensions)` on the builder, or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * The DataFrame API reaches the same expressions through
  * [[graft.functions.VectorExprs]] without any registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot requires exactly 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
  }
}
