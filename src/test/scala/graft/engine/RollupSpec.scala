package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The IVM contract of [[Rollup]]: a report combined from per-batch
  * partials equals the direct aggregate over the union of the batches —
  * exactly for the integer-closed aggregates (count/min/max), to rounding
  * for the double sums — and the journal's size scales with groups ×
  * batches, never rows.
  */
class RollupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def orders = graft.engine.Sources.table(spark,
    "/root/testdata/sf0.001", "orders")

  test("journaled partials combine to the direct aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("rollup").toString
    val j = s"$dir/journal"
    Rollup.journalBatch(orders.filter(col("o_orderkey") % 3 === 0), j,
      Seq("o_orderstatus"), "o_totalprice", "b0")
    Rollup.journalBatch(orders.filter(col("o_orderkey") % 3 === 1), j,
      Seq("o_orderstatus"), "o_totalprice", "b1")
    Rollup.journalBatch(orders.filter(col("o_orderkey") % 3 === 2), j,
      Seq("o_orderstatus"), "o_totalprice", "b2")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderstatus"), col("n"),
          round(col("total"), 2).as("total"), col("min_v"), col("max_v"))
        .collect().map(_.toSeq).sortBy(_.head.toString)

    val fromJournal = canon(Rollup.report(spark, j, Seq("o_orderstatus")))
    val direct = canon(orders.groupBy(col("o_orderstatus"))
      .agg(sum(col("o_totalprice")).as("total"), count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_v"),
        max(col("o_totalprice")).as("max_v")))
    assert(fromJournal.toSeq == direct.toSeq)

    // O(groups × batches) journal rows: 3 statuses × 3 batches at most.
    assert(spark.read.parquet(j).count() <= 9)
  }
}
