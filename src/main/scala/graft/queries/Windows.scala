package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.AsOf

/** Window-function surface (SURVEY §2.5 — extended; the reference has none).
  *
  * Every data-scale window here partitions by a key whose cardinality
  * GROWS with the data (custkey, user_id) — so at 100 TB the hash shuffle
  * spreads evenly and no single partition exceeds one key's rows. ONE
  * deliberate exception: `q_window_ntile` runs a global (single-task)
  * window because global distribution ranks are exact only under a total
  * order — it is a REPORT-shaped query (run it on aggregated/sampled
  * input; at raw 100 TB use approx_percentile or partition by segment, as
  * its comment spells out). No terminal ORDER BY — the driver compares
  * sorted, so a presentation sort would only add a global exchange.
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ranking: top-3 orders per customer (deterministic tiebreak).
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // Dedup-keep-latest: one row per user, newest event wins (the
    // incremental-load dedup the reference would need the moment loads stop
    // being truncate-and-reload; SURVEY §2.5).
    "q_dedup_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    }),

    // Running (cumulative) sum per user in event-time order.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 2).as("running_value"))
    }),

    // Lag: milliseconds since the user's previous event.
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w))
            .as("ms_since_prev"))
    }),

    // Distribution ranks: quartile bucket + percent_rank + cume_dist per
    // customer-spend ordering. All rank-family functions are exact under a
    // TOTAL order (the o_orderkey tiebreak) — without it every engine is
    // free to bucket peers differently. Scale note: an unpartitioned
    // window serializes into ONE task — fine for a report-sized input
    // (this is post-aggregation shape), but a 100 TB global quantile wants
    // approx_percentile or a per-segment partition instead.
    // Global NTILE / percent_rank / cume_dist WITHOUT the single-partition
    // window: a bare Window.orderBy(...) funnels the whole table through
    // one task (the r13 26× ledger measured that shape at 19.9× growth).
    // GlobalRank range-repartitions on the (unique) sort key, ranks
    // partitions in parallel, and derives all three measures from the
    // exact global row number — same rows as the single-partition plan,
    // pinned by the unchanged oracle.
    "q_window_ntile" -> ((s, dir) => {
      val (ranked, n) = graft.ext.GlobalRank.withGlobalRowNumberAdaptive(
        t(s, dir, "orders"), "rn",
        col("o_totalprice").desc, col("o_orderkey").asc)
      ranked.select(col("o_orderkey"),
        graft.ext.GlobalRank.ntileFromRowNumber(col("rn"), n, 4)
          .as("quartile"),
        round(if (n > 1) (col("rn") - 1) / lit((n - 1).toDouble)
          else lit(0.0), 6).as("pct_rank"),
        round(col("rn") / lit(n.toDouble), 6).as("cume"))
    }),

    // The scale-safe distribution-rank shape the q_window_ntile comment
    // prescribes: the SAME rank family, but partitioned by a segment key
    // (o_orderstatus), so each segment's ranks compute in its own task —
    // the 100 TB form (per-segment quantiles), vs the global single-task
    // report above. PlanSpec pins that the window carries the partition.
    "q_window_ntile_seg" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
    }),

    // Frame-boundary navigation: each user's first / last / second event
    // value over the full per-user frame — the session-summary projection
    // (entry event, exit event, second touch). One row per user via the
    // rn=1 filter; the frame must be UNBOUNDED BOTH WAYS or last/nth see
    // only the running prefix. Same data-scaled user_id partitioning as
    // the other event windows.
    "q_window_first_last" -> ((s, dir) => {
      val order = Seq(col("ts"), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wn = Window.partitionBy(col("user_id")).orderBy(order: _*)
      t(s, dir, "events")
        .select(col("user_id"),
          first(col("value")).over(w).as("first_val"),
          last(col("value")).over(w).as("last_val"),
          nth_value(col("value"), 2).over(w).as("second_val"),
          row_number().over(wn).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
    }),

    // Percent-of-total (ratio-to-report): each nation's share of its
    // region's order revenue. The window runs over the ALREADY-AGGREGATED
    // (region, nation) table — 25 rows here, |nations| at any scale — so
    // the partition-by-region sum is a report-stage op; the data-scale work
    // is the preceding groupBy, which shuffles once on the grouping key.
    // Dims broadcast (nation/region are tiny at every SF).
    "q_pct_of_total" -> ((s, dir) => {
      val nat = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(round(sum(col("o_totalprice")), 2).as("total"))
      val w = Window.partitionBy(col("region"))
      nat.select(col("region"), col("nation"), col("total"),
        round(lit(100) * col("total") / sum(col("total")).over(w), 4)
          .as("pct_of_region"))
    }),

    // Event-TIME range frame: each event's trailing-10-minute sum per user
    // — RANGE frames bound by an interval are the per-row sliding window
    // (resample/window() buckets are the per-bucket one). SQL expression:
    // the DataFrame rangeBetween API takes only numeric offsets.
    "q_window_range" -> ((s, dir) =>
      t(s, dir, "events").selectExpr(
        "event_id", "user_id",
        """round(sum(value) OVER (
          |  PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW),
          |  2) AS trailing_10m""".stripMargin)),

    // Moving average over a 4-row frame (3 preceding + current).
    "q_window_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(avg(col("value")).over(w), 4).as("avg_4"))
    }),

    // As-of join: each error event enriched with the latest preceding click
    // (union + running-last — ONE shuffle, no quadratic self-join; see
    // graft.ext.AsOf).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
      val clicks = ev.filter(col("event_type") === "click")
      AsOf.enrich(errors, clicks, "user_id", "ts", "ts")
        .select(col("event_id"), col("user_id"),
          col("asof_ts").as("last_click_ts"),
          col("asof_count").as("n_prior_clicks"))
    }),

    // Forward as-of: each error enriched with the NEXT click at-or-after
    // it ("did the user recover?") — same one-shuffle union+window plan,
    // iterated in descending time order.
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
      val clicks = ev.filter(col("event_type") === "click")
      AsOf.enrichForward(errors, clicks, "user_id", "ts", "ts")
        .select(col("event_id"), col("user_id"),
          col("asof_ts").as("next_click_ts"),
          col("asof_count").as("n_later_clicks"))
    }),

    // As-of with a staleness bound: the preceding click only counts when at
    // most 1 hour old — same single-shuffle plan, tolerance as post-filter.
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
      val clicks = ev.filter(col("event_type") === "click")
      AsOf.enrichWithin(errors, clicks, "user_id", "ts", "ts",
        expr("INTERVAL 1 HOUR"))
        .select(col("event_id"), col("user_id"),
          col("asof_ts").as("recent_click_ts"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_dedup_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_window_running" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_window_lag" ->
      """SELECT event_id, user_id,
        |  epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS ms_since_prev
        |FROM events ORDER BY event_id""".stripMargin,

    "q_window_moving_avg" ->
      """SELECT event_id, user_id,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS avg_4
        |FROM events ORDER BY event_id""".stripMargin,

    "q_window_ntile" ->
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER
        |    (ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT)
        |    AS quartile,
        |  round(percent_rank() OVER
        |    (ORDER BY o_totalprice DESC, o_orderkey ASC), 6) AS pct_rank,
        |  round(cume_dist() OVER
        |    (ORDER BY o_totalprice DESC, o_orderkey ASC), 6) AS cume
        |FROM orders""".stripMargin,

    "q_window_ntile_seg" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT)
        |    AS quartile,
        |  round(percent_rank() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey ASC), 6) AS pct_rank,
        |  round(cume_dist() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey ASC), 6) AS cume
        |FROM orders""".stripMargin,

    "q_window_first_last" ->
      """WITH v AS (
        |  SELECT user_id,
        |    first_value(value) OVER w AS first_val,
        |    last_value(value) OVER w AS last_val,
        |    nth_value(value, 2) OVER w AS second_val,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_val, last_val, second_val
        |FROM v WHERE rn = 1""".stripMargin,

    "q_pct_of_total" ->
      """WITH nat AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    round(sum(o.o_totalprice), 2) AS total
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2)
        |SELECT region, nation, total,
        |  round(100 * total / sum(total) OVER (PARTITION BY region), 4)
        |    AS pct_of_region
        |FROM nat""".stripMargin,

    "q_window_range" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW),
        |    2) AS trailing_10m
        |FROM events""".stripMargin,

    "q_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  max(c.ts) AS last_click_ts,
        |  count(c.event_id) AS n_prior_clicks
        |FROM events e
        |LEFT JOIN events c ON c.user_id = e.user_id
        |  AND c.event_type = 'click' AND c.ts <= e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_forward" ->
      """SELECT e.event_id, e.user_id,
        |  min(c.ts) AS next_click_ts,
        |  count(c.event_id) AS n_later_clicks
        |FROM events e
        |LEFT JOIN events c ON c.user_id = e.user_id
        |  AND c.event_type = 'click' AND c.ts >= e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id
        |ORDER BY e.event_id""".stripMargin,

    "q_asof_tolerance" ->
      """SELECT e.event_id, e.user_id,
        |  CASE WHEN max(c.ts) >= e.ts - INTERVAL 1 HOUR
        |    THEN max(c.ts) END AS recent_click_ts
        |FROM events e
        |LEFT JOIN events c ON c.user_id = e.user_id
        |  AND c.event_type = 'click' AND c.ts <= e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id, e.ts""".stripMargin,
  )
}
