package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scalable replacement for the
  * `Window.orderBy(...)` (no partition) shape, whose WindowExec moves the
  * ENTIRE table through one task (Spark itself warns "Moving all data to a
  * single partition"). The r13 factor-26 ledger measured the global-ntile
  * query at 19.9× growth riding that single task; every other window query
  * in the registry partitions by a data-scaled key and grew ~linearly.
  *
  * Shape: range-repartition on the sort keys (Spark's sampled
  * RangePartitioner gives globally ordered partitions), rank WITHIN each
  * partition in parallel, then add broadcast cumulative partition counts.
  * The per-partition counts are O(#partitions) driver metadata — the same
  * bounded class as the incremental boundary grid — and the global row
  * number is exact regardless of where the sampled range boundaries fall,
  * because ranks are derived from actual sorted positions, not from the
  * boundaries. Ordering keys must be unique (give a tiebreak column), so
  * rank == row_number == dense position and the derived percent_rank /
  * cume_dist definitions collapse to (rn−1)/(n−1) and rn/n.
  */
object GlobalRank {

  /** Rows below which the single-task window wins: the distributed plan
    * pays a checkpoint, a counts job, and two exchanges — measured 1.5 s
    * vs 0.7 s on the 150K-row bench fixture — while one task sorts a
    * million rows in well under a second. Above it the single task is the
    * bottleneck (19.9× growth at factor 26 before the rewrite).
    */
  val SmallThreshold = 1000000L

  /** Adaptive entry point: count first (one cheap aggregate; columnar
    * sources answer it from footer statistics), then pick the
    * single-task window below [[SmallThreshold]] or the distributed rank
    * above it. Same rows either way — the oracle pins that.
    */
  def withGlobalRowNumberAdaptive(df: DataFrame, rnCol: String,
      keys: Column*): (DataFrame, Long) = {
    val n = df.count()
    if (n <= SmallThreshold) {
      val w = Window.orderBy(keys: _*)
      (df.withColumn(rnCol, row_number().over(w).cast("long")), n)
    } else withGlobalRowNumber(df, rnCol, keys: _*)
  }

  /** `df` plus a 1-based global row number `rnCol` under `keys`, and the
    * total row count (free — it is the sum of the partition counts).
    */
  def withGlobalRowNumber(df: DataFrame, rnCol: String, keys: Column*)
      : (DataFrame, Long) = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint: the ranged frame feeds BOTH the counts aggregate
    // and the final projection; without it the range shuffle runs twice.
    // (Production twin: persist / a staged table.)
    val ranged = df.repartitionByRange(parts, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offDf = df.sparkSession.createDataFrame(
      offsets.toSeq.map { case (p, o) => (p, o) })
      .toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(keys: _*)
    val out = ranged
      .join(broadcast(offDf), Seq("_pid"))
      .withColumn(rnCol, row_number().over(w).cast("long") + col("_off"))
      .drop("_pid", "_off")
    (out, n)
  }

  /** Spark/SQL-standard NTILE(k) over a known total count from a global
    * row number: the first n%k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋.
    * Driver-side n keeps the expression pure column arithmetic. Doubles
    * are exact here to 2^53 rows.
    */
  def ntileFromRowNumber(rn: Column, n: Long, k: Int): Column = {
    val big = n % k
    val sz = n / k
    val cut = big * (sz + 1)
    when(rn <= cut, floor((rn - 1) / lit(sz + 1.0)) + 1)
      .otherwise(lit(big) + floor((rn - cut - 1) / lit(sz.toDouble)) + 1)
      .cast("long")
  }
}
