package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Sessionize

/** Event-time surface over the events fixture (SURVEY §2.9): tumbling and
  * sliding windows, batch sessionization, and JSON scalar extraction — the
  * batch-SQL-expressible projection of the streaming feature set (the true
  * `readStream` path lives in graft.streaming and is ScalaTest-verified,
  * since it has no DuckDB oracle).
  *
  * Scale notes: tumbling/sliding windows are pure groupBy shuffles keyed by
  * (bucket, type) — cardinality grows with time span, not row count, so
  * partial aggregation absorbs nearly everything map-side. Sessionization is
  * one shuffle per key (see graft.ext.Sessionize). JSON extraction is a
  * codegen'd projection (`get_json_object`), no UDF.
  */
object Events {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour window per event type (Spark's window() operator;
    // epoch-aligned buckets).
    "q_time_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(col("window.start").as("bucket"), col("event_type"),
          col("n"), col("total"))),

    // Sliding 1-hour window, 30-minute slide: each event lands in 2 buckets
    // (Spark emits w/slide windows per row via Expand — map-side, no join).
    "q_time_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total"))),

    // Batch sessionization: 30-minute inactivity gap per user.
    "q_sessionize" -> ((s, dir) =>
      Sessionize.sessions(t(s, dir, "events"), "user_id", "ts",
          tieBreak = "event_id", gapMillis = 30 * 60 * 1000L,
          valueCol = "value")),

    // JSON scalar extraction from the props column (F-extension; the
    // reference carries WKT/JSON-ish payloads as opaque text).
    "q_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // JSON values aggregated: distribution stats of props.k per event type.
    "q_json_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))),
  )

  val oracles: Map[String, String] = Map(
    "q_time_tumbling" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    // Epoch-aligned sliding buckets: start = (floor(epoch/slide) - k)*slide
    // for k in {0,1}; make_timestamp keeps the result a naive-UTC TIMESTAMP
    // (to_timestamp would yield TIMESTAMPTZ and break the compare).
    "q_time_sliding" ->
      """WITH x AS (
        |  SELECT e.*, (CAST(floor(epoch(ts) / 1800) AS BIGINT) - t.k) * 1800
        |    AS start_s
        |  FROM events e, (VALUES (0), (1)) AS t(k)
        |  WHERE epoch(ts) < ((CAST(floor(epoch(ts) / 1800) AS BIGINT) - t.k)
        |    * 1800) + 3600)
        |SELECT make_timestamp(start_s * 1000000) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_json_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
