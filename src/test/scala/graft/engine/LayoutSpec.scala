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

  test("quantile bucket: boundary semantics, determinism, codegen/eval parity") {
    import graft.functions.BucketExprs
    val bounds = Array(10.0, 20.0, 30.0)
    val df = spark.range(1).select(
      BucketExprs.quantileBucket(lit(5.0), bounds).as("below"),
      BucketExprs.quantileBucket(lit(10.0), bounds).as("on_first"),
      BucketExprs.quantileBucket(lit(15.0), bounds).as("mid"),
      BucketExprs.quantileBucket(lit(30.0), bounds).as("on_last"),
      BucketExprs.quantileBucket(lit(35.0), bounds).as("above"),
      BucketExprs.quantileBucket(lit(null).cast("double"), bounds).as("nul"))
    val r = df.head()
    assert(r.getLong(0) == 0L) // below every boundary
    assert(r.getLong(1) == 1L) // boundary-equal → upper bucket
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 3L)
    assert(r.getLong(4) == 3L) // above every boundary
    assert(r.isNullAt(5))
    // interpreted eval agrees with the codegen'd path exercised above
    val e = graft.functions.QuantileBucket(
      org.apache.spark.sql.catalyst.expressions.Literal(15.0), bounds)
    assert(e.eval(null) == 1L)
  }

  test("string prefix pack is order-preserving (the property bucketing needs)") {
    import graft.functions.BucketExprs
    val df = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("a"), Tuple1("ab"), Tuple1("abc"), Tuple1("abce"),
      Tuple1("abd"), Tuple1("b"), Tuple1("éclair"), Tuple1("zebra-longtail")))
      .toDF("s")
      .select(col("s"), BucketExprs.stringPrefixLong(col("s")).as("p"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    // packed order must match string order (UTF-8 binary collation):
    // notably "abce" < "abd" — the case a non-padded hex pack gets wrong
    val byString = rows.sortBy(_._1).map(_._1).toSeq
    val byPacked = rows.sortBy(r => (r._2, r._1)).map(_._1).toSeq
    assert(byPacked == byString,
      s"packed order diverged from string order: $byPacked vs $byString")
    assert(rows.forall(_._2 >= 0L), "7-byte pack must stay non-negative")
  }

  test("z-order clusters string keys: pruning on a string range predicate") {
    val root = java.nio.file.Files.createTempDirectory("graft-zstr")
    try {
      // high-cardinality string key whose order mirrors custkey
      val orders = Sources.table(spark, "/root/testdata/sf0.01", "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          concat(lit("k"), lpad(col("o_custkey").cast("string"), 6, "0"))
            .as("skey"))
      val total = orders.count()
      val dir = s"$root/z"
      Layout.zOrderBy(orders, "skey", "o_totalprice", 16)
        .write.parquet(dir)
      // a ~3% string range: k000000 .. k000047-ish
      val pred = col("skey").between("k000001", "k000047")
      val df = spark.read.parquet(dir).filter(pred)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scanned = plan.collectLeaves()
        .collect { case f: FileSourceScanExec => f }
        .map(_.metrics("numOutputRows").value).sum
      assert(scanned <= total / 2,
        s"string-key z-order pruned too little: $scanned of $total")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("z-order accepts a timestamp key: files cover narrow time spans") {
    val root = java.nio.file.Files.createTempDirectory("graft-zts")
    try {
      val orders = Sources.table(spark, "/root/testdata/sf0.01", "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      val dir = s"$root/z"
      Layout.zOrderBy(orders, "o_orderdate", "o_totalprice", 16)
        .write.parquet(dir)
      // Asserted on the WRITE-side property (per-file time min/max), not
      // scan metrics: Spark currently declines to convert TIMESTAMP_NTZ
      // predicates into parquet filter predicates, so the reader cannot
      // yet row-group-prune on this column even though the file stats
      // would admit it — the layout is what zOrderBy owns, and the same
      // stats serve any stats-aware reader (and Spark, once NTZ pushdown
      // lands). Fixture span is 1995-01..2001-08; count files whose
      // [min, max] overlaps a ~3% band — most must exclude it.
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
      val nFiles = spans.count()
      val overlapping = spans.filter(
        col("lo") <= lit("1995-03-15") && col("hi") >= lit("1995-01-01"))
        .count()
      assert(nFiles >= 8, s"expected ~16 output files, got $nFiles")
      assert(overlapping <= nFiles / 2,
        s"time band overlaps $overlapping of $nFiles files — timestamp key " +
          "not clustered")
      assert(overlapping >= 1, "band must overlap at least one file")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("z-order write plan has no Window — rank compression must not global-sort") {
    val orders = Sources.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val planned = Layout.zOrderBy(orders, "o_custkey", "o_totalprice", 4)
    val windows = planned.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty,
      "z-order write plan contains a Window — at 100 TB that is a " +
        "single-task global sort at write time")
  }

  test("z-order prunes on BOTH dimensions where single-key sort helps only one") {
    val root = java.nio.file.Files.createTempDirectory("graft-zorder")
    try {
      val orders = Sources.table(spark, "/root/testdata/sf0.01", "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val total = orders.count()
      val files = 16

      val singleDir = s"$root/bykey"
      orders.repartitionByRange(files, col("o_custkey"))
        .sortWithinPartitions("o_custkey").write.parquet(singleDir)
      val zDir = s"$root/zorder"
      Layout.zOrderBy(orders, "o_custkey", "o_totalprice", files)
        .write.parquet(zDir)

      // narrow bands on each dimension (~3-5% of the value space)
      val ck = orders.agg(min("o_custkey"), max("o_custkey")).head()
      val ckBand = col("o_custkey")
        .between(ck.getLong(0), ck.getLong(0) + (ck.getLong(1) - ck.getLong(0)) / 32)
      val tp = orders.stat.approxQuantile("o_totalprice",
        Array(0.40, 0.45), 0.001)
      val tpBand = col("o_totalprice").between(tp(0), tp(1))

      def scanRows(dir: String, pred: org.apache.spark.sql.Column): Long = {
        val df = spark.read.parquet(dir).filter(pred)
        df.collect()
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        plan.collectLeaves()
          .collect { case f: org.apache.spark.sql.execution
            .FileSourceScanExec => f }
          .map(_.metrics("numOutputRows").value).sum
      }

      // leading dimension: both layouts prune well
      assert(scanRows(singleDir, ckBand) <= total / 4)
      assert(scanRows(zDir, ckBand) <= total / 2,
        "z-order should still prune the first dimension")
      // trailing dimension: the single-key layout smears it (reads ~all),
      // z-order's rectangles prune it too
      val singleTp = scanRows(singleDir, tpBand)
      val zTp = scanRows(zDir, tpBand)
      assert(singleTp.toDouble / total > 0.9,
        s"single-key layout unexpectedly pruned the trailing dim ($singleTp)")
      assert(zTp <= singleTp / 2,
        s"z-order pruned too little on the trailing dim: $zTp vs $singleTp")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }
}
