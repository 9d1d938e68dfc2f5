package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation-as-operator — the reference's signature capability
  * (SURVEY §2.11), re-expressed as ONE multi-aggregate pass (mirroring the
  * validator's single BigQuery statement, data_validator.py:88-98) plus a
  * fold to an exit-code-style verdict (data_validator.py:181-219).
  *
  * Blocking checks fail the suite; warn-only checks are reported but don't
  * (the reference's split: row-count/schema/distinct floors block; null
  * counts, range, consistency, duplicates warn — data_loader.py:339-388).
  *
  * Scale note: all metric aggregates evaluate in a single job / single
  * partial+final hash-aggregate over the data — adding a check adds a column,
  * not a pass. No collect of data rows; only the 1-row metric tuple reaches
  * the driver.
  */
object Checks {

  /** One check: an aggregate metric column + a pass predicate over it. */
  final case class Check(
      name: String,
      metric: Column,
      passes: Double => Boolean,
      blocking: Boolean)

  final case class CheckResult(
      name: String, value: Double, passed: Boolean, blocking: Boolean)

  final case class SuiteResult(results: Seq[CheckResult]) {
    /** Airflow-contract exit semantics: any blocking failure → fail. */
    def passed: Boolean = results.forall(r => r.passed || !r.blocking)
    def exitCode: Int = if (passed) 0 else 1
    def warnings: Seq[CheckResult] = results.filter(r => !r.passed && !r.blocking)
  }

  /** Evaluate all checks in one aggregate pass.
    *
    * A NULL metric FAILS its check (fail-closed): `max(ts)` over an empty
    * table is NULL, and coercing it to 0 would make a blocking freshness
    * gate pass vacuously on exactly the input it exists to catch.
    */
  def run(df: DataFrame, checks: Seq[Check]): SuiteResult = {
    require(checks.nonEmpty, "empty check suite")
    val aggs = checks.map(c => c.metric.cast("double").as(c.name))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    SuiteResult(checks.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(i))
        CheckResult(c.name, Double.NaN, passed = false, c.blocking)
      else {
        val v = row.getDouble(i)
        CheckResult(c.name, v, c.passes(v), c.blocking)
      }
    })
  }

  // ---- the reference's standard checks ----

  /** A1 gate: row count ≥ min (MIN_EXPECTED_ROWS=100000 in the reference). */
  def rowCountMin(min: Long): Check =
    Check(s"row_count_min_$min", count(lit(1)), _ >= min, blocking = true)

  /** A2 gate: COUNT(DISTINCT col) ≥ floor (≥5 years, ≥10 locations). */
  def distinctMin(colName: String, min: Long): Check =
    Check(s"distinct_${colName}_min_$min", countDistinct(col(colName)),
      _ >= min, blocking = true)

  /** A2 at 100 TB: HLL++ approximate distinct floor. The exact
    * `distinctMin` stays the oracle-checked default; at scale the
    * expand-based exact rewrite multiplies shuffle volume per distinct
    * aggregate, while HLL++ is one fixed-size sketch per partition. Floors
    * tolerate approximation by construction — a ≥10-locations gate doesn't
    * care about ±2% on 10,000.
    */
  def approxDistinctMin(colName: String, min: Long,
      rsd: Double = 0.05): Check =
    Check(s"approx_distinct_${colName}_min_$min",
      approx_count_distinct(col(colName), rsd), _ >= min, blocking = true)

  /** A3 warn: null count on a critical column == 0. */
  def nullCount(colName: String): Check =
    Check(s"nulls_$colName", count(when(col(colName).isNull, true)),
      _ == 0, blocking = false)

  /** P5 warn: values outside [lo, hi] (violations counted, rows kept). */
  def rangeCheck(colName: String, lo: Double, hi: Double): Check =
    Check(s"range_$colName",
      count(when(col(colName) < lo || col(colName) > hi, true)),
      _ == 0, blocking = false)

  /** P4 warn: logical consistency — count of rows violating `predicate`. */
  def consistency(name: String, predicate: Column): Check =
    Check(s"consistency_$name", count(when(predicate, true)),
      _ == 0, blocking = false)

  /** A5 warn: duplicate full rows == 0 (count − distinct-count).
    *
    * The distinct count runs over ONE struct of all columns, not a bare
    * column list: multi-argument COUNT(DISTINCT c1..cn) skips any tuple
    * containing a NULL, which would report every null-bearing row as a
    * duplicate. A struct with null fields is itself non-null, so this
    * matches `dropDuplicates().count()` semantics in a single pass.
    */
  def duplicateCount(df: DataFrame): Check = {
    val cols = df.columns.map(col).toIndexedSeq
    Check("duplicate_rows",
      count(lit(1)) - countDistinct(struct(cols: _*)),
      _ == 0, blocking = false)
  }

  /** A6: data freshness — hours since max(tsCol) ≤ maxAgeHours (declared in
    * the reference's FLOW_DIAGRAMS.md but unimplemented; trivial here).
    */
  def freshness(tsCol: String, maxAgeHours: Double): Check =
    freshnessAt(tsCol, maxAgeHours, current_timestamp())

  /** [[freshness]] with an injected evaluation instant — the same
    * constant-injection pattern the incremental family uses for
    * `loaded_at`, which is what lets the age metric sit under the DuckDB
    * oracle (q_freshness) instead of only wall-clock ScalaTest. Seconds
    * resolution (unix_timestamp truncates sub-second), matching the
    * reference's hour-granularity gate.
    */
  def freshnessAt(tsCol: String, maxAgeHours: Double, now: Column): Check =
    Check(s"freshness_$tsCol",
      (unix_timestamp(now) - unix_timestamp(max(col(tsCol)))) / 3600.0,
      _ <= maxAgeHours, blocking = true)

  /** Required-columns contract (metadata check, no data pass). */
  def requiredColumns(df: DataFrame, required: Set[String]): CheckResult = {
    val missing = Schemas.missingRequired(df.schema, required)
    CheckResult(s"required_columns", missing.size.toDouble,
      missing.isEmpty, blocking = true)
  }

  /** P4/P5 audit side-output: the violating rows themselves (reference
    * writes them to validation_issues_log.csv, data_loader.py:379-384).
    * Union + dedup of the violation sets = reference U1 without its
    * NameError bug.
    */
  def violations(df: DataFrame, predicates: Seq[Column]): DataFrame =
    if (predicates.isEmpty) df.limit(0)
    else predicates.map(df.filter).reduce(_ unionByName _).dropDuplicates()
}
