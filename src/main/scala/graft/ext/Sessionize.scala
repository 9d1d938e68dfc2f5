package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: assign session ids per key from an inactivity gap
  * (the batch twin of Structured Streaming's session window; SURVEY §2.9).
  *
  * One shuffle on the key, one per-partition sort, two window passes fused
  * into the same sort order — linear and skew-bounded; no state kept on the
  * driver. At 100 TB the same plan holds: sessions never cross keys, so the
  * key-hash shuffle is the exact minimum data movement the semantics need.
  */
object Sessionize {

  /** Add a `session_id` column (1-based per key, ordered by time — the
    * running sum of new-session flags starts at 1 on the first event).
    */
  def withSessionIds(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: String, gapMillis: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(unix_millis(col(tsCol)), 1).over(w)
    val newSession =
      when(prev.isNull || unix_millis(col(tsCol)) - prev > gapMillis, 1L)
        .otherwise(0L)
    df.withColumn("__new_s", newSession)
      .withColumn("session_id",
        sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__new_s")
  }

  /** Collapse to one row per session with start/end/count/value rollups. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: String, gapMillis: Long, valueCol: String): DataFrame =
    withSessionIds(df, keyCol, tsCol, tieBreak, gapMillis)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("total_value"))
}
