package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The 100 TB quantile path: `q_percentiles` is exact (sort-based,
  * fixture-scale), but the Windows.scala scaladoc prescribes
  * approx_percentile for raw-scale distributions — this pins the sketch's
  * rank error as a measured bound so the "use approx at scale" advice
  * stays backed by evidence, not folklore. No DuckDB oracle can apply:
  * the sketch's exact output is implementation-defined; the error bound
  * is the testable contract. The asserted bound is 10× the nominal
  * 1/accuracy — partial-aggregate merges degrade the GK guarantee by a
  * constant factor, and the pin is about catching an unbounded
  * regression, not the exact constant.
  */
class ApproxSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("approx_percentile rank error stays bounded") {
    val ev = graft.engine.Sources.table(spark, "/root/testdata/sf0.001",
      "events").select(col("value")).localCheckpoint()
    val n = ev.count().toDouble
    val accuracy = 1000
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val apx = ev.agg(
        expr(s"approx_percentile(value, $p, $accuracy)")).head().getDouble(0)
      val rank = ev.filter(col("value") <= apx).count() / n
      assert(math.abs(rank - p) <= 10.0 / accuracy,
        s"approx p$p returned $apx at true rank $rank — error " +
          s"${math.abs(rank - p)} exceeds 10/accuracy")
    }
  }
}
