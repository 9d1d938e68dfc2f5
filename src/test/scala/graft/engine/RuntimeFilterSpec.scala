package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Runtime (bloom) filters: Catalyst's answer to "the fact scan reads
  * 100 TB to join against a filtered dimension that keeps 1% of keys".
  * With `spark.sql.optimizer.runtime.bloomFilter.*` active, the optimizer
  * plans a bloom-filter aggregate over the SELECTIVE side's join keys and
  * injects `bloom_filter_might_contain` into the LARGE side's scan, so
  * non-joining fact rows die at the scan instead of traveling through the
  * shuffle. Size thresholds gate it in production (creation side small,
  * application side huge); this pins the mechanism at fixture scale by
  * lifting the thresholds — the plan shape is what must not regress.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom filter into the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture-scale: drop the 10 GB application-side floor; keep the
      // creation side limit above the filtered dim size
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      // the injected filter must not be satisfied by a broadcast reuse —
      // force the join to shuffle so the bloom path is the one exercised
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    // getOption-style read: some keys (adaptive broadcast threshold)
    // report a null default, which set() rejects — treat as unset
    val saved = confs.map { case (k, _) =>
      k -> util.Try(Option(spark.conf.get(k))).toOption.flatten }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = Sources.table(spark, "/root/testdata/sf0.01", "lineitem")
      val dim = Sources.table(spark, "/root/testdata/sf0.01", "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.contains("might_contain") || plan.contains("bloom"),
        s"no runtime bloom filter injected:\n$plan")
      // and it still answers correctly
      assert(joined.collect().map(_.getLong(1)).sum > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
