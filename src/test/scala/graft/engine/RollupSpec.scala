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

  test("compactJournal folds partials to O(groups), report unchanged, ledger carried") {
    val dir = java.nio.file.Files.createTempDirectory("rollup-compact").toString
    val j = s"$dir/journal"
    (0 until 8).foreach(i => Rollup.journalBatch(
      orders.filter(col("o_orderkey") % 8 === i), j,
      Seq("o_orderstatus"), "o_totalprice", s"b$i"))
    // a streaming commit marker that must survive the swap
    val marker = new java.io.File(s"$j/_graft_commits")
    marker.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$j/_graft_commits/3"), """{"batchId":3,"rows":0}""")

    def canon() = Rollup.report(spark, j, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n"), col("n_val"),
        round(col("total"), 2).as("total"), col("min_v"), col("max_v"))
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq

    val before = canon()
    val filesBefore = spark.read.parquet(j).inputFiles.length
    val rep = Rollup.compactJournal(spark, j)
    assert(rep.ok, rep.detail)
    assert(canon() == before, "compaction changed the report")
    val filesAfter = spark.read.parquet(j).inputFiles.length
    assert(filesAfter < filesBefore,
      s"journal file count did not collapse: $filesBefore -> $filesAfter")
    // one partial row per group now
    assert(spark.read.parquet(j).count() ==
      orders.select("o_orderstatus").distinct().count())
    assert(new java.io.File(s"$j/_graft_commits/3").exists(),
      "commit ledger lost in the swap — replayed batchIds would re-append")

    // the compacted journal must stay appendable: a new batch lands on top
    // of the folded partials and the report keeps combining correctly
    Rollup.journalBatch(orders.limit(100), j,
      Seq("o_orderstatus"), "o_totalprice", "b_new")
    val withNew = Rollup.report(spark, j, Seq("o_orderstatus"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(withNew == orders.count() + 100,
      "post-compaction append did not combine with folded partials")
  }

  test("report self-heals a crash-replay duplicate (same tag journaled twice)") {
    val dir = java.nio.file.Files.createTempDirectory("rollup-replay").toString
    val j = s"$dir/journal"
    val batch = orders.filter(col("o_orderkey") % 2 === 0)
    Rollup.journalBatch(batch, j, Seq("o_orderstatus"), "o_totalprice", "b0")
    val once = Rollup.report(spark, j, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n"), round(col("total"), 2))
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    // the crash-between-journal-and-marker seam: the SAME batch appends its
    // (identical) partials a second time on replay
    Rollup.journalBatch(batch, j, Seq("o_orderstatus"), "o_totalprice", "b0")
    val twice = Rollup.report(spark, j, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n"), round(col("total"), 2))
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    assert(twice == once, "replayed batch double-counted in the report")
  }

  test("n vs n_val: derived average must use the non-null count (SQL AVG)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rollup-nulls").toString
    val j = s"$dir/journal"
    val batch = Seq(("a", Some(10.0)), ("a", None), ("a", Some(20.0)))
      .toDF("k", "v")
    Rollup.journalBatch(batch, j, Seq("k"), "v", "b0")
    val r = Rollup.report(spark, j, Seq("k")).head()
    assert(r.getAs[Long]("n") == 3L) // COUNT(*)
    assert(r.getAs[Long]("n_val") == 2L) // COUNT(v)
    // AVG(v) = 15.0, not Σv / COUNT(*) = 10.0
    assert(r.getAs[Double]("total") / r.getAs[Long]("n_val") == 15.0)
  }

  test("histogram journal: mergeable quantile estimates within grid error") {
    val dir = java.nio.file.Files.createTempDirectory("rollup-hist").toString
    val j = s"$dir/journal"
    val os = graft.engine.Sources.table(spark, "/root/testdata/sf0.01",
      "orders")
    // frozen grid: ~256 equi-depth boundaries from the reference data
    val bounds = os.stat.approxQuantile("o_totalprice",
      (1 until 256).map(_ / 256.0).toArray, 0.001).distinct.sorted
    (0 until 3).foreach(i => Rollup.journalHistogram(
      os.filter(col("o_orderkey") % 3 === i), j,
      Seq("o_orderstatus"), "o_totalprice", bounds, s"b$i"))

    def ests() = Rollup.quantileEstimate(spark, j, Seq("o_orderstatus"),
        bounds, Seq(0.5, 0.95))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val est = ests()

    // every estimate must land inside a generous exact-rank band
    // (grid error is ~1/256 in rank; the band allows ±5%)
    val exact = os.groupBy(col("o_orderstatus")).agg(
        percentile(col("o_totalprice"), lit(0.45)).as("lo50"),
        percentile(col("o_totalprice"), lit(0.55)).as("hi50"),
        percentile(col("o_totalprice"), lit(0.90)).as("lo95"),
        percentile(col("o_totalprice"), lit(0.99)).as("hi95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    est.foreach { case (g, p, v) =>
      val (lo50, hi50, lo95, hi95) = exact(g)
      if (p == 0.5) assert(v >= lo50 && v <= hi50,
        s"$g p50 estimate $v outside [$lo50, $hi50]")
      else assert(v >= lo95 && v <= hi95,
        s"$g p95 estimate $v outside [$lo95, $hi95]")
    }

    // merge-decomposability + replay self-heal: re-journaling a batch
    // changes nothing; compaction collapses files, estimates identical
    Rollup.journalHistogram(os.filter(col("o_orderkey") % 3 === 0), j,
      Seq("o_orderstatus"), "o_totalprice", bounds, "b0")
    assert(ests() == est, "replayed histogram batch shifted the estimate")
    val filesBefore = spark.read.parquet(j).inputFiles.length
    val rep = Rollup.compactJournal(spark, j)
    assert(rep.ok, rep.detail)
    assert(ests() == est, "compaction shifted the estimate")
    assert(spark.read.parquet(j).inputFiles.length < filesBefore)
  }

  test("deletes: sum/count retract exactly; min/max degrade to stale bounds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rollup-del").toString
    val j = s"$dir/journal"
    Rollup.journalBatch(Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v"),
      j, Seq("k"), "v", "b0")
    // Retraction partial for deleting the row v=3.0: sum/counts negate
    // (abelian group); min/max have NO retraction value — journal them as
    // NULL so the combine ignores them.
    Seq(("a", -3.0, -1L, -1L, Option.empty[Double], Option.empty[Double], "d0"))
      .toDF("k", "p_sum", "p_cnt", "p_rows", "p_min", "p_max", "batch")
      .write.mode("append").parquet(j)
    val r = Rollup.report(spark, j, Seq("k")).head()
    assert(r.getAs[Double]("total") == 3.0) // 6 - 3: exact under delete
    assert(r.getAs[Long]("n") == 2L) // exact under delete
    // true max is now 2.0 but the journal cannot know: max_v keeps the
    // deleted 3.0 as a conservative BOUND — the documented limitation.
    assert(r.getAs[Double]("max_v") == 3.0)
  }
}
