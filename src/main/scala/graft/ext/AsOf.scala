package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with `right.ts <= left.ts` sharing the key (SURVEY §2.3 extended surface).
  *
  * Spark-first design: instead of the naive non-equi self-join (quadratic
  * per key — each left row rescans every right row for its key), tag and
  * UNION the two sides, then take a running `last(..., ignoreNulls)` over a
  * single (key, ts)-ordered window. Cost: ONE shuffle on the key + a
  * per-partition sort — linear in |left|+|right|, skew-bounded by the
  * hottest key, no broadcast requirement on either side. This survives a
  * 100× scale-up where the nested-loop form does not.
  */
object AsOf {

  /** Enrich `left` with the latest preceding right-side timestamp and a
    * running count of preceding right rows, per key.
    *
    * @param left     probe side
    * @param right    reference side (e.g. the events to look up)
    * @param keyCol   equi key on both sides
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @return left rows + `asof_ts` (nullable) + `asof_count` (0 if none)
    */
  def enrich(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String): DataFrame =
    enrichImpl(left, right, keyCol, leftTs, rightTs, forward = false)

  /** The FORWARD direction: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` sharing the key (next-event lookup — "first
    * click after the error"), plus the count of following-or-equal right
    * rows. Same union + one-shuffle window plan, iterated in descending
    * time order.
    */
  def enrichForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String): DataFrame =
    enrichImpl(left, right, keyCol, leftTs, rightTs, forward = true)

  private def enrichImpl(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
    // Equi-join null semantics: right rows with a NULL key or NULL
    // timestamp can never match any probe, so they must not reach the
    // window (a NULL-key partition would otherwise "enrich" NULL-key
    // probes, and a NULL-ts row would inflate asof_count).
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTs).isNotNull)
      .select(
        col(keyCol),
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        col(rightTs).as("__rts"))
    // Align schemas in ONE select: right side carries typed nulls for
    // left-only columns. A per-column withColumn fold would nest O(cols)
    // projections into the logical plan — harmless at 4 columns, analysis
    // bloat at 300.
    val rCols = r.columns.toSet
    val rAligned = r.select(leftCols.map { c =>
      if (rCols.contains(c)) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)
    } ++ Seq(col("__ts"), col("__side"), col("__rts")): _*)
    val unioned = l.select((leftCols.map(col) ++
      Seq(col("__ts"), col("__side"), col("__rts"))): _*).unionByName(rAligned)

    // right rows sort BEFORE left rows at equal ts (side 0 < 1): an event
    // at exactly the probe instant counts as "preceding or equal" — and in
    // the forward (descending-time) iteration the same tiebreak makes it
    // "following or equal". The running last then holds the LATEST
    // preceding (backward) or EARLIEST following (forward) right ts.
    // desc_nulls_first, NOT plain desc: a NULL probe ts must keep sorting
    // BEFORE every real right row (as it does in the ascending backward
    // order) so it matches nothing — plain .desc puts NULLS LAST, which
    // would hand a NULL-ts probe the earliest right row and the full count.
    val tsOrder =
      if (forward) col("__ts").desc_nulls_first else col("__ts").asc
    val w = Window.partitionBy(keyCol).orderBy(tsOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .withColumn("asof_count",
        sum(when(col("__side") === 0, 1L).otherwise(0L)).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rts")
  }

  /** [[enrich]] with a staleness bound (market-data as-of semantics): the
    * matched timestamp only counts when within `tolerance` of the probe.
    * A post-filter on the running-last is exact — if the LATEST preceding
    * right row is too old, every earlier one is older still — so the
    * linear one-shuffle plan is unchanged. `asof_count` is dropped: the
    * running total counts ALL preceding rows, which would misread as
    * "count within tolerance".
    */
  def enrichWithin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      tolerance: org.apache.spark.sql.Column): DataFrame =
    enrich(left, right, keyCol, leftTs, rightTs)
      .withColumn("asof_ts",
        when(col("asof_ts") >= col(leftTs) - tolerance, col("asof_ts")))
      .drop("asof_count")
}
