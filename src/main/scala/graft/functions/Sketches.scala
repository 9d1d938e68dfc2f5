package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark as `hll_sketch_agg`/`hll_union_agg`) — the re-aggregation pattern
  * exact COUNT(DISTINCT) cannot support at 100 TB.
  *
  * The scale problem: exact distinct state is O(cardinality) per group and
  * cannot be combined across jobs — yesterday's distinct user count and
  * today's don't add. A sketch is O(2^lgK) bytes REGARDLESS of cardinality,
  * and union is associative + commutative + idempotent, so per-shard /
  * per-day sketches persisted as binary columns roll up along any
  * dimension later WITHOUT rescanning the raw data: daily job sketches its
  * own partition, monthly report unions 30 sketches. Error is ~1.04/√2^lgK
  * (≈1.6% at the default lgK=12) independent of scale.
  *
  * Reference tie-in: the validator's COUNT(DISTINCT) gates
  * (`/root/reference/data_validator.py:88-98`) are the exact-form
  * ancestors; [[graft.engine.Checks.approxDistinctMin]] is the streaming
  * estimate; this is the PERSISTED form a fleet of jobs shares.
  */
object Sketches {

  /** One HLL sketch of `valueCol` per `groupCols` group — a binary `hll`
    * column safe to write to parquet and union later. One partial+final
    * hash-agg: partial sketches combine map-side, so shuffle volume is
    * O(groups × 2^lgK) bytes, never O(rows).
    */
  def sketchBy(df: DataFrame, valueCol: String, groupCols: Seq[String],
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll stored sketches up to a coarser grouping (possibly global:
    * `groupCols = Nil`) and estimate. Union-then-estimate over the binary
    * column only — the raw data is not touched, which is the entire point.
    */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String])
      : DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"), lit(false)))
        .as("approx_distinct"))
}
