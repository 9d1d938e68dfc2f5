package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Data-layout → data-skipping: the write-side lever that makes selective
  * scans cheap at 100 TB. Parquet journals min/max per row group; a scan
  * with a pushed range predicate skips every row group whose stats exclude
  * the range. Whether anything CAN be skipped is decided at write time:
  * range-partition + sort on the access key gives each file/row-group a
  * tight, disjoint key span (the poor man's clustering — same idea
  * Z-ordering generalizes to multiple keys), while a round-robin layout
  * smears every key across every file and the same scan reads everything.
  *
  * The assertion reads the scan node's OWN numOutputRows metric (rows the
  * reader actually surfaced after row-group pruning) — not the query
  * result, which is identical by construction.
  */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Execute and return rows emitted by the parquet scan itself. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves()
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-sorted layout lets the scan skip row groups; round-robin reads all") {
    val root = java.nio.file.Files.createTempDirectory("graft-layout")
    try {
      val orders = Sources.table(spark, "/root/testdata/sf0.01", "orders")
      val smeared = s"$root/roundrobin"
      val clustered = s"$root/rangesorted"
      orders.repartition(8).write.parquet(smeared)
      orders.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey").write.parquet(clustered)

      val bounds = orders.agg(min("o_orderkey"), max("o_orderkey")).head()
      val lo = bounds.getLong(0)
      val hi = bounds.getLong(1)
      // a ~3% key range: inside one range-partition's span by construction
      val width = math.max(1L, (hi - lo) / 32)
      def narrow(dir: String) = spark.read.parquet(dir)
        .filter(col("o_orderkey").between(lo, lo + width))

      // same answer from both layouts...
      val expected = narrow(smeared).count()
      assert(narrow(clustered).count() == expected)

      // ...but the clustered scan surfaces a fraction of the rows: only
      // the row groups whose min/max admit the range are read at all
      val rowsSmeared = scanOutputRows(narrow(smeared))
      val rowsClustered = scanOutputRows(narrow(clustered))
      assert(rowsSmeared.toDouble / orders.count() > 0.9,
        s"round-robin layout should read ~every row group " +
          s"($rowsSmeared of ${orders.count()})")
      assert(rowsClustered <= rowsSmeared / 4,
        s"range-sorted layout skipped too little: " +
          s"$rowsClustered vs $rowsSmeared")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }
}
