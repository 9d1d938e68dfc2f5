package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mirrors the validator's gates and blocking/warn split
  * (/root/reference/data_validator.py:181-219) plus the fail-closed and
  * null-safety fixes.
  */
class ChecksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq(
      (2020L, Some("asthma"), Some(10.0)),
      (2021L, Some("diabetes"), None),
      (2021L, None, Some(150.0)),
      (2021L, None, Some(150.0))).toDF("yearstart", "topic", "datavalue")
  }

  test("blocking failure fails the suite; exit code 1") {
    val r = Checks.run(df, Seq(Checks.rowCountMin(100)))
    assert(!r.passed && r.exitCode == 1)
  }

  test("warn-only failures keep the suite green but are reported") {
    val r = Checks.run(df, Seq(
      Checks.rowCountMin(1),
      Checks.nullCount("topic"),
      Checks.rangeCheck("datavalue", 0, 100)))
    assert(r.passed && r.exitCode == 0)
    assert(r.warnings.map(_.name).toSet ==
      Set("nulls_topic", "range_datavalue"))
  }

  test("distinctMin gate") {
    val r = Checks.run(df, Seq(Checks.distinctMin("yearstart", 2)))
    assert(r.passed)
    val r2 = Checks.run(df, Seq(Checks.distinctMin("yearstart", 3)))
    assert(!r2.passed)
  }

  test("approxDistinctMin: HLL floor tracks the exact count") {
    import spark.implicits._
    val d = (1 to 1000).map(i => i % 100).toDF("k")
    assert(Checks.run(d, Seq(Checks.approxDistinctMin("k", 90))).passed)
    assert(!Checks.run(d, Seq(Checks.approxDistinctMin("k", 200))).passed)
  }

  test("NULL metric fails closed (freshness over empty table)") {
    import spark.implicits._
    val empty = Seq.empty[(java.sql.Timestamp, Long)].toDF("loaded_at", "x")
    val r = Checks.run(empty, Seq(Checks.freshness("loaded_at", 24.0)))
    assert(!r.passed)
    assert(r.results.head.value.isNaN)
  }

  test("freshness passes on recent data, fails on stale") {
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val fresh = Seq(Tuple1(now)).toDF("loaded_at")
    assert(Checks.run(fresh, Seq(Checks.freshness("loaded_at", 24.0))).passed)
    val stale = Seq(Tuple1(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .toDF("loaded_at")
    assert(!Checks.run(stale, Seq(Checks.freshness("loaded_at", 24.0))).passed)
  }

  test("duplicateCount is null-safe: null-bearing unique rows are not dups") {
    import spark.implicits._
    val d = Seq(
      (Some("a"), Some(1)), (Some("a"), Some(1)), // one real dup
      (None, Some(2)), (None, Some(3))            // null-bearing, unique
    ).toDF("k", "v")
    val r = Checks.run(d, Seq(Checks.duplicateCount(d)))
    assert(r.results.head.value == 1.0)
  }

  test("consistency check counts violating rows") {
    import spark.implicits._
    val d = Seq((2020L, 2021L), (2022L, 2021L)).toDF("ys", "ye")
    val r = Checks.run(d,
      Seq(Checks.consistency("year_order", col("ys") > col("ye"))))
    assert(!r.results.head.passed && r.results.head.value == 1.0)
  }

  test("violations: union+dedup of predicate sets; empty predicates -> empty") {
    import spark.implicits._
    val d = Seq((1, 10), (2, 200), (3, -5)).toDF("id", "v")
    val out = Checks.violations(d, Seq(col("v") > 100, col("v") < 0))
    assert(out.count() == 2)
    assert(Checks.violations(d, Nil).count() == 0)
  }

  test("requiredColumns metadata check") {
    val ok = Checks.requiredColumns(df, Set("yearstart", "topic"))
    assert(ok.passed)
    val bad = Checks.requiredColumns(df, Set("yearstart", "loaded_at"))
    assert(!bad.passed && bad.blocking)
  }
}
