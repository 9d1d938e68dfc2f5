package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates: per-batch PARTIALS
  * (sum/count/min/max per group) journaled to parquet, combined into the
  * current report by re-aggregating the journal — sum of sums, sum of
  * counts, min of mins, max of maxs, avg = Σsum/Σcount.
  *
  * The 100 TB point: a daily report over an append-only fact should not
  * rescan history. Each batch contributes O(groups) journal rows once, at
  * batch time; the report then reads O(groups × batches) partial rows —
  * independent of raw row count. This is the exact-arithmetic sibling of
  * [[graft.functions.Sketches]] (same shard-then-merge shape, exact
  * instead of approximate, limited to decomposable aggregates — a median
  * or COUNT(DISTINCT) does NOT journal this way; use the sketch).
  *
  * Batch idempotence is the caller's contract (same seam as streaming
  * ingestion): re-journaling a batch double-counts it. Under a streaming
  * source, guard the append with the commit-ledger pattern of
  * [[graft.streaming.Streams]]; the batch tag column makes an audit (or a
  * targeted re-build of one batch's partials) a metadata-only operation.
  *
  * Reference tie-in: the validator recomputes COUNT/aggregate gates over
  * the WHOLE analytics table daily (`/root/reference/data_validator.py:64`)
  * — this is that recomputation made O(increment).
  */
object Rollup {

  /** Reduce one batch to its per-group partials and append them to the
    * journal. One partial+final hash-agg over the batch, one tiny write.
    */
  def journalBatch(batch: DataFrame, journalDir: String,
      groupCols: Seq[String], valueCol: String, batchTag: String): Unit =
    batch.groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol)).as("p_sum"), count(lit(1)).as("p_cnt"),
        min(col(valueCol)).as("p_min"), max(col(valueCol)).as("p_max"))
      .withColumn("batch", lit(batchTag))
      .write.mode("append").parquet(journalDir)

  /** Current report from the journal alone: raw data is never touched.
    * Columns: group cols + total / n / min_v / max_v.
    */
  def report(spark: SparkSession, journalDir: String,
      groupCols: Seq[String]): DataFrame =
    spark.read.parquet(journalDir)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("p_sum")).as("total"), sum(col("p_cnt")).as("n"),
        min(col("p_min")).as("min_v"), max(col("p_max")).as("max_v"))
}
