package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

/** Direct expression-level tests for DotProduct: the interpreted path
  * (nullSafeEval) is exercised explicitly, since whole-stage codegen will
  * otherwise mask it; codegen/interpreted parity is what guarantees
  * fallback correctness.
  */
class VectorExprsSpec extends AnyFunSuite {

  private def lit(xs: Seq[java.lang.Double]) =
    Literal.create(xs, ArrayType(DoubleType))

  test("interpreted eval: sequential fold, exact") {
    val e = DotProduct(lit(Seq(1.0, 2.0, 3.0)), lit(Seq(4.0, 5.0, 6.0)))
    assert(e.eval(null) == 32.0)
  }

  test("interpreted eval: mismatched lengths -> null (zip_with parity)") {
    val e = DotProduct(lit(Seq(1.0, 2.0)), lit(Seq(3.0, 4.0, 99.0)))
    assert(e.eval(null) == null)
  }

  test("interpreted eval: null element -> null result") {
    val e = DotProduct(lit(Seq(1.0, null)), lit(Seq(1.0, 2.0)))
    assert(e.eval(null) == null)
  }

  test("interpreted eval: null array -> null result") {
    val e = DotProduct(Literal.create(null, ArrayType(DoubleType)),
      lit(Seq(1.0)))
    assert(e.eval(null) == null)
  }

  test("empty arrays fold to the 0.0 zero element") {
    val e = DotProduct(lit(Seq.empty), lit(Seq.empty))
    assert(e.eval(null) == 0.0)
  }

  test("type check rejects non-double arrays with a useful message") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bad = DotProduct(Literal(1), Literal(2))
    assert(bad.checkInputDataTypes().isFailure)
  }
}
