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

  /** The other scale-path sketch: approx_count_distinct (HLL++) replaces
    * the exact expand-based COUNT(DISTINCT) of q_validate_metrics when the
    * distinct cardinality itself is data-scaled (user ids, doc
    * fingerprints). The rsd parameter is the documented standard error —
    * pin a 5× multiple so a broken sketch merge fails loudly while normal
    * estimator variance never does.
    */
  test("q_perplexity_band_approx: every language's rank_ok verdict holds " +
      "— the query's own two-sided tie-aware rank contract on both " +
      "tertile edges") {
    val rows = Docs.queries("q_perplexity_band_approx")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"lang ${r.getString(0)} (n=${r.getLong(1)}): sketch edge landed " +
          "outside max(2, n/1000) ranks of its tertile target")
    }
  }

  test("approx_count_distinct error stays within 5x the configured rsd") {
    val ev = graft.engine.Sources.table(spark, "/root/testdata/sf0.001",
      "events").localCheckpoint()
    val rsd = 0.02
    for (c <- Seq("user_id", "event_id", "event_type")) {
      val exact = ev.select(col(c)).distinct().count().toDouble
      val approx = ev.agg(approx_count_distinct(col(c), rsd))
        .head().getLong(0).toDouble
      assert(math.abs(approx - exact) / exact <= 5 * rsd,
        s"approx_count_distinct($c)=$approx vs exact=$exact — relative " +
          s"error ${math.abs(approx - exact) / exact} exceeds 5*rsd")
    }
  }
}
