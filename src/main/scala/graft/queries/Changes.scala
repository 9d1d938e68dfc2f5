package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture surface: MERGE-style upsert, snapshot
  * reconciliation, and change-log → SCD Type-2 dimension history — the
  * warehouse-maintenance operators the reference's truncate-and-reload
  * design sidesteps (data_loader.py:429-433 rebuilds the whole table daily;
  * these are what replace that pattern the moment the table is too big to
  * rebuild).
  *
  * Scale notes: every operator here is ONE shuffle on the natural key —
  * merge and diff are a single full-outer hash/sort-merge join (the change
  * batch side is typically small enough for AQE to broadcast), SCD2 is two
  * windows over the same `user_id` hash partitioning (cardinality grows
  * with the data, so no single task concentrates). No iteration, no
  * driver materialization.
  *
  * The change batches are derived deterministically from the fixture
  * tables (key-modulus selectors) so the DuckDB oracles can reproduce them
  * exactly — the operators themselves take any (key, op, payload) batch.
  */
object Changes {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MERGE INTO semantics: apply an upsert/delete batch to a snapshot.
    // Changes: keys %11 → delete, else keys %5 → update (price +100), plus
    // inserts under fresh (negated) keys for %7 at half price. One
    // full-outer join on the key resolves all three ops; rows marked D
    // drop, U/I take the batch payload, untouched base rows pass through.
    // Payload arithmetic is binary-exact (+100 shifts the exponent, /2
    // decrements it) — a rounded multiply would let the two engines'
    // round-half conventions diverge on boundary values.
    "q_merge_upsert" -> ((s, dir) => {
      val base = t(s, dir, "orders")
      val changes = base
        .filter(col("o_orderkey") % 5 === 0 || col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey").as("key"),
          when(col("o_orderkey") % 11 === 0, "D").otherwise("U").as("op"),
          (col("o_totalprice") + 100).as("new_totalprice"))
        .unionAll(base.filter(col("o_orderkey") % 7 === 0)
          .select((-col("o_orderkey")).as("key"), lit("I").as("op"),
            (col("o_totalprice") / 2).as("new_totalprice")))
      base.join(changes, base("o_orderkey") === changes("key"), "full")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(coalesce(col("o_orderkey"), col("key")).as("o_orderkey"),
          when(col("op") === "U" || col("op") === "I", col("new_totalprice"))
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          col("o_orderstatus"))
    }),

    // Snapshot reconciliation: full-outer join two table versions on the
    // key, emit one row per divergence (added / removed / changed) with the
    // list of columns whose values differ — the audit a loader runs before
    // promoting a rebuilt table. Null-safe comparison (<=>) so NULL→value
    // transitions register as changes, never as matches.
    "q_table_diff" -> ((s, dir) => {
      val base = t(s, dir, "orders")
      val old = base.filter(col("o_orderkey") % 7 =!= 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val nw = base.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 5 === 0,
            round(col("o_totalprice") * 1.05, 2))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      val joined = old.alias("o")
        .join(nw.alias("n"), col("o.o_orderkey") === col("n.o_orderkey"),
          "full")
      val both = col("o.o_orderkey").isNotNull && col("n.o_orderkey").isNotNull
      val statusDiff = !(col("o.o_orderstatus") <=> col("n.o_orderstatus"))
      val priceDiff = !(col("o.o_totalprice") <=> col("n.o_totalprice"))
      joined
        .filter(col("o.o_orderkey").isNull || col("n.o_orderkey").isNull ||
          statusDiff || priceDiff)
        .select(
          coalesce(col("o.o_orderkey"), col("n.o_orderkey")).as("o_orderkey"),
          when(col("o.o_orderkey").isNull, "added")
            .when(col("n.o_orderkey").isNull, "removed")
            .otherwise("changed").as("change"),
          concat_ws(",",
            when(both && statusDiff, "o_orderstatus"),
            when(both && priceDiff, "o_totalprice")).as("changed_cols"))
    }),

    // Change-log → SCD Type-2: collapse the per-user event stream into
    // attribute versions (a version opens only when event_type CHANGES —
    // consecutive repeats fold into the open version), then close each
    // version with the next version's start. Two windows over the same
    // user_id partitioning; event_id breaks timestamp ties so version
    // boundaries are deterministic under any row order.
    "q_scd2" -> ((s, dir) => scd2Dim(s, dir)),

    // Point-in-time lookup against the SCD2 dimension — the canonical
    // warehouse pattern the versioned dimension exists FOR: each fact
    // (purchase events) joins the version valid AT ITS TIMESTAMP,
    // from <= ts < to (open current version matches everything after its
    // from). The join is an EQUI-join on user_id with the interval as a
    // post-filter — per-user version chains are short, so this is a hash
    // join at any corpus scale, never an NLJ.
    "q_scd2_pit" -> ((s, dir) => {
      val dim = scd2Dim(s, dir).select(col("user_id"),
        col("event_type").as("regime"), col("effective_from"),
        col("effective_to"))
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
        .join(dim, Seq("user_id"))
        .filter(col("effective_from") <= col("ts") &&
          (col("effective_to").isNull || col("ts") < col("effective_to")))
        .select(col("user_id"), col("event_id"), col("regime"),
          col("effective_from"))
    }),
  )

  /** The SCD2 dimension build (regime changes of a user's event stream
    * versioned by [effective_from, effective_to)) — ONE definition for
    * the build query and the point-in-time lookup.
    */
  private def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val versions = t(s, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").as("effective_from"))
    val w2 = Window.partitionBy(col("user_id"))
      .orderBy(col("effective_from"), col("event_id"))
    versions
      .withColumn("effective_to", lead(col("effective_from"), 1).over(w2))
      .withColumn("is_current", col("effective_to").isNull)
      .select("user_id", "event_type", "effective_from", "effective_to",
        "is_current")
  }

  val oracles: Map[String, String] = Map(

    "q_merge_upsert" ->
      """WITH changes AS (
        |  SELECT o_orderkey AS key,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice + 100 AS new_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0 OR o_orderkey % 11 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, 'I', o_totalprice / 2
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT coalesce(b.o_orderkey, c.key) AS o_orderkey,
        |  CASE WHEN c.op = 'U' OR c.op = 'I' THEN c.new_totalprice
        |       ELSE b.o_totalprice END AS o_totalprice,
        |  b.o_orderstatus
        |FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.key
        |WHERE c.op IS NULL OR c.op <> 'D'""".stripMargin,

    "q_table_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 7 <> 0),
        |new AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice * 1.05, 2)
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 13 <> 0)
        |SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |       WHEN n.o_orderkey IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change,
        |  concat_ws(',',
        |    CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
        |      AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |      THEN 'o_orderstatus' END,
        |    CASE WHEN o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
        |      AND o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |      THEN 'o_totalprice' END) AS changed_cols
        |FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |  OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice""".stripMargin,

    "q_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |versions AS (
        |  SELECT user_id, event_type, event_id, ts AS effective_from
        |  FROM ordered WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, effective_from,
        |  lead(effective_from) OVER
        |    (PARTITION BY user_id ORDER BY effective_from, event_id)
        |    AS effective_to,
        |  (lead(effective_from) OVER
        |    (PARTITION BY user_id ORDER BY effective_from, event_id) IS NULL)
        |    AS is_current
        |FROM versions""".stripMargin,

    "q_scd2_pit" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |versions AS (
        |  SELECT user_id, event_type, event_id, ts AS effective_from
        |  FROM ordered WHERE prev IS NULL OR prev <> event_type),
        |dim AS (
        |  SELECT user_id, event_type AS regime, effective_from,
        |    lead(effective_from) OVER
        |      (PARTITION BY user_id ORDER BY effective_from, event_id)
        |      AS effective_to
        |  FROM versions),
        |facts AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id, d.regime, d.effective_from
        |FROM facts f JOIN dim d ON d.user_id = f.user_id
        |  AND d.effective_from <= f.ts
        |  AND (d.effective_to IS NULL OR f.ts < d.effective_to)"""
        .stripMargin,
  )
}
