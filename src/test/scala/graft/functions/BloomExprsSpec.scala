package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bloom membership probe: no false negatives ever, false-positive
  * rate in the configured ballpark, null pass-through, and codegen /
  * interpreted agreement.
  */
class BloomExprsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val members = (0L until 2000L).map(i => s"key-$i")
  private lazy val bloom = members.toDF("k")
    .select(xxhash64(col("k")).as("kh"))
    .stat.bloomFilter("kh", 2000, 0.03)

  test("every inserted key passes (no false negatives)") {
    val survivors = members.toDF("k")
      .filter(BloomExprs.mightContainHashed(xxhash64(col("k")), bloom))
      .count()
    assert(survivors == 2000L)
  }

  test("disjoint keys are mostly rejected, near the configured fpp") {
    val strangers = (0L until 10000L).map(i => s"other-$i").toDF("k")
    val passed = strangers
      .filter(BloomExprs.mightContainHashed(xxhash64(col("k")), bloom))
      .count()
    assert(passed < 1000L, s"fpp blew up: $passed/10000 strangers passed")
  }

  test("null probe yields null, so a filter drops it (SQL semantics)") {
    val df = Seq(Some("key-1"), None).toDF("k")
    val kept = df
      .filter(BloomExprs.mightContainHashed(xxhash64(col("k")), bloom))
      .count()
    // xxhash64(null) is null -> probe null -> filter not-true -> dropped
    assert(kept == 1L)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bytes = BloomExprs.serialize(bloom)
    for (probe <- Seq(123L, -1L, 0L, Long.MaxValue)) {
      val interpreted =
        BloomMightContainLong(Literal(probe), bytes).eval(null)
      val viaDf = Seq(1).toDF("x")
        .select(BloomExprs.mightContainHashed(lit(probe), bloom))
        .head.get(0)
      assert(interpreted == viaDf, s"probe $probe diverged")
    }
  }
}
