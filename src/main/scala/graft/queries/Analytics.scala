package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H-shaped analytics over the star schema — the decision-
  * support patterns an analytics engine must plan well: selective dim
  * filter → fact join chain → aggregate → top-k (Q3/Q10 shape) and the
  * six-way join with a cross-side equality (Q5 shape).
  *
  * Scale notes: dimension filters reach the scans (pushdown); nation/region
  * broadcast; fact⋈fact shuffles on the join key with AQE; the top-k ends
  * in TakeOrderedAndProject, never a global sort of the aggregate.
  */
object Analytics {

  /** Revenue computed in EXACT decimal arithmetic, surfaced as double.
    * Q3/Q10 cut a LIMIT on this aggregate: with plain double summation the
    * two engines' addition orders could round a boundary group to
    * different cents and select different top-k sets. Decimal sums are
    * order-independent, so round→cast is bit-identical everywhere.
    */
  private def revenueExact = round(
    sum(col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))),
    2).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q3 shape: shipping priority — segment-filtered customers, orders
    // before / lineitems shipped after a date, top-10 open-order revenue.
    "q_tpch_q3" -> ((s, dir) => {
      val cutoff = lit("1997-06-01").cast("timestamp")
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revenueExact.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Q5 shape: local supplier volume — six-way join where customer and
    // supplier must share a nation, grouped by nation within one region.
    "q_tpch_q5" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenue.as("revenue"))
    }),

    // Q10 shape: returned-item reporting — top-20 customers by lost revenue
    // in a quarter, with their nation.
    "q_tpch_q10" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-04-01").cast("timestamp"))
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(revenueExact.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Q17 shape: small-quantity-order revenue — a CORRELATED scalar
    // subquery (each lineitem compared to 20% of its part's average
    // quantity), deliberately written as SQL text so Catalyst's subquery
    // decorrelation is what plans it: the rewrite must produce an
    // aggregate-then-join, never a per-row nested loop (pinned in
    // PlanSpec). Direct file relations keep it reentrant like q_sql_text.
    // The threshold is deterministic cross-engine: l_quantity is
    // integer-valued, so sum (exact in double) / count is order-independent.
    // The /7.0 runs in DOUBLE in BOTH engines (sum stays exact decimal,
    // then one cast): decimal-typed division evaluates at engine-specific
    // precision, which can flip the last rounded cent near a .005 boundary.
    "q_tpch_q17" -> ((s, dir) =>
      s.sql(s"""SELECT p_brand,
               |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
               |    AS DOUBLE) / CAST(7.0 AS DOUBLE), 2) AS avg_yearly
               |FROM parquet.`$dir/lineitem.parquet` l
               |JOIN parquet.`$dir/part.parquet` p
               |  ON p.p_partkey = l.l_partkey
               |WHERE p.p_type = 'ECONOMY'
               |  AND l.l_quantity < (
               |    SELECT 0.2 * avg(l2.l_quantity)
               |    FROM parquet.`$dir/lineitem.parquet` l2
               |    WHERE l2.l_partkey = l.l_partkey)
               |GROUP BY p_brand""".stripMargin)),

    // Q1 shape: the pricing summary report — full multi-aggregate scan
    // (8 aggregates, 2 group keys) over ~99% of lineitem. All money sums
    // run in exact decimal then surface as rounded doubles; the averages
    // divide exact numerators (decimal sums / integer-valued doubles) so
    // both engines feed round() bit-identical inputs.
    "q_tpch_q1" -> ((s, dir) => {
      def dec(c: String) = col(c).cast("decimal(18,4)")
      val one = lit(1).cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(dec("l_extendedprice")), 2).cast("double")
            .as("sum_base_price"),
          round(sum(dec("l_extendedprice") * (one - dec("l_discount"))), 2)
            .cast("double").as("sum_disc_price"),
          round(sum(dec("l_extendedprice") * (one - dec("l_discount")) *
            (one + dec("l_tax"))), 2).cast("double").as("sum_charge"),
          round(sum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          round(sum(dec("l_extendedprice")).cast("double") / count(lit(1)), 4)
            .as("avg_price"),
          round(sum(dec("l_discount")).cast("double") / count(lit(1)), 6)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Q6 shape: forecast revenue change — the pure scan-filter-aggregate
    // probe. Every predicate must reach the parquet scan (PushedFilters);
    // the plan is one WholeStageCodegen span over the scan with a 1-row
    // partial+final agg, zero joins, zero wide shuffles.
    "q_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)") *
          col("l_discount").cast("decimal(18,4)")), 2).cast("double")
          .as("revenue"))),

    // Q4 shape: order-priority checking — EXISTS rewritten as a LEFT SEMI
    // join with a non-equi conjunct (late-shipped: any lineitem ≥ 90 days
    // after the order date; the fixture carries no commit/receipt dates, so
    // the lateness predicate stands in for Q4's commit<receipt). The semi
    // join keeps the probe side at most one output row per order — no
    // fan-out, no dedup.
    "q_tpch_q4" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q14 shape: promotion effect — conditional aggregation over the
    // lineitem⋈part join, one month. Both sums run exact decimal; the
    // percentage division happens once, in DOUBLE, on both engines.
    "q_tpch_q14" -> ((s, dir) => {
      def dec(c: String) = col(c).cast("decimal(18,4)")
      val one = lit(1).cast("decimal(18,4)")
      val discPrice = dec("l_extendedprice") * (one - dec("l_discount"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      li.join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg((round(
          sum(when(col("p_type") === "PROMO", discPrice).otherwise(0))
            .cast("double") * 100.0 /
          sum(discPrice).cast("double"), 4)).as("promo_revenue"))
    }),

    // Q22 shape: global-customer-value prospects — customers above the
    // global average balance (a SCALAR subquery: one broadcast 1-row agg,
    // never a per-row rescan) with no URGENT order (NOT EXISTS → LEFT
    // ANTI join; the priority condition keeps the result non-empty on
    // this fixture, where every customer has SOME order), rolled up per
    // nation. The anti join shuffles on the key like a semi join — no
    // nested loop at any scale (registry-wide CartesianProduct absence is
    // pinned in PlanSpec).
    "q_tpch_q22" -> ((s, dir) =>
      s.sql(s"""SELECT c_nationkey, count(*) AS numcust,
               |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2)
               |    AS DOUBLE) AS totacctbal
               |FROM parquet.`$dir/customer.parquet` c
               |WHERE c.c_acctbal > (
               |    SELECT avg(c2.c_acctbal)
               |    FROM parquet.`$dir/customer.parquet` c2
               |    WHERE c2.c_acctbal > 0.0)
               |  AND NOT EXISTS (
               |    SELECT 1 FROM parquet.`$dir/orders.parquet` o
               |    WHERE o.o_custkey = c.c_custkey
               |      AND o.o_orderpriority = '1-URGENT')
               |GROUP BY c_nationkey""".stripMargin)),

    // Q12 shape: shipping-mode/priority matrix — orders⋈lineitem on the
    // key, a "late line" predicate (shipped ≥60 days after order; the
    // fixture has no commit/receipt dates, so lateness stands in for Q12's
    // receipt>commit), then CASE-counts split by priority class, grouped by
    // line status (stands in for shipmode). One shuffle join + one 2-row
    // agg; integer counts are merge-order-independent.
    "q_tpch_q12" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") >=
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
          sum(when(high, 0).otherwise(1)).as("low_line_count"))
    }),

    // Q13 shape: customer order-count distribution — the LEFT OUTER join
    // that must keep zero-order customers (an inner join silently drops
    // the c_count=0 bucket, the most common Q13 bug), then a second
    // aggregate over the first: count orders per customer, histogram the
    // counts. Orders filtered pre-join so the filter reaches the scan.
    "q_tpch_q13" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q15 shape: top supplier by quarterly revenue — an aggregate whose
    // MAX selects the output rows. The 100-row revenue aggregate is
    // localCheckpointed once and consumed twice (rows + its own max):
    // exchange reuse does not fire across self-join re-aliasing, so
    // without the checkpoint the lineitem scan+agg would run twice. The
    // max comparison stays in exact decimal (order-independent), rounded
    // only at output.
    "q_tpch_q15" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") -
            col("l_discount").cast("decimal(18,4)"))).as("rev"))
        .localCheckpoint()
      val top = rev.join(
        broadcast(rev.agg(max(col("rev")).as("maxrev"))),
        col("rev") === col("maxrev"))
      top.join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("rev"), 2).cast("double").as("total_revenue"))
    }),

    // Q18 shape: large-volume customers — a HAVING-gated aggregate of the
    // fact table drives a semi-selective join back to orders+customer.
    // The big-order set is an aggregate of lineitem itself (at 100 TB it
    // shrinks by ~orders/lineitem × selectivity, so the second join is a
    // shuffle join on the already-aggregated side, never a re-scan), and
    // the top-k ends in TakeOrderedAndProject. sum(l_quantity) sums
    // integer-valued doubles — exact, so the >300 gate and the sort agree
    // cross-engine.
    "q_tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      big.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // Q21 shape: suppliers who kept orders waiting — the EXISTS/NOT-EXISTS
    // pair over the same derived relation: late lines in finished orders
    // where ANOTHER supplier shipped the same order (semi join,
    // suppkey-inequality conjunct) but NO other supplier was late (anti
    // join). The 3-column derived relation is localCheckpointed once and
    // feeds all three roles; both joins shuffle on l_orderkey with the
    // inequality evaluated post-match — no nested loop (CartesianProduct
    // absence is registry-pinned). Counts are exact; top-20 with an
    // s_name tie-break ends in TakeOrderedAndProject.
    "q_tpch_q21" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
        .localCheckpoint()
      val l1 = li.filter(col("late"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.filter(col("late"))
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      l1.join(l2, col("l_orderkey") === col("k2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("k3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }),

    // Q19 shape: discounted revenue under a three-way DISJUNCTION of
    // (brand, size range, quantity range) triples — the predicate spans
    // both join sides, so only the p_partkey equi-join prunes the pair
    // space; the compound filter evaluates post-join inside codegen.
    // part broadcasts (it's the dimension side).
    "q_tpch_q19" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand &&
          col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(band("Brand#12", 15, 1, 11) ||
          band("Brand#23", 20, 10, 20) || band("Brand#3", 25, 20, 30))
        .groupBy(col("p_brand"))
        .agg(revenueExact.as("revenue"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q_tpch_q17" ->
      """SELECT p_brand,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
        |    AS DOUBLE) / CAST(7.0 AS DOUBLE), 2) AS avg_yearly
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_type = 'ECONOMY'
        |  AND l.l_quantity < (
        |    SELECT 0.2 * avg(l2.l_quantity)
        |    FROM lineitem l2
        |    WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p_brand""".stripMargin,

    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
        |    AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4))) *
        |    (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
        |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*), 4) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |  CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate >= o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q_tpch_q14" ->
      """SELECT round(
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,4))) ELSE 0 END)
        |    AS DOUBLE) * 100.0 /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,

    "q_tpch_q22" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS totacctbal
        |FROM customer c
        |WHERE c.c_acctbal > (
        |    SELECT avg(c2.c_acctbal) FROM customer c2
        |    WHERE c2.c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey""".stripMargin,

    // DuckDB sum(INTEGER CASE arms) yields HUGEINT; Spark's sum(when(…,1))
    // yields LongType — cast the counts to BIGINT so the type hash agrees
    // (same artifact class as q_dedup_kept's chars_kept).
    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus""".stripMargin,

    // The Spark side filters orders BEFORE the left join; in SQL that is
    // the ON-clause condition (a WHERE would turn the outer join inner and
    // drop the zero-order customers Q13 exists to keep).
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    // The max comparison runs on the EXACT decimal aggregate (order-
    // independent), rounding only at output — same as the Spark side.
    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(round(rev, 2) AS DOUBLE)
        |  AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = (SELECT max(rev) FROM rev)""".stripMargin,

    // sum(l_quantity) sums doubles on both engines (l_quantity is DOUBLE
    // in the fixture), so the >300 gate and sum_qty hash agree untyped.
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 300) big
        |JOIN orders ON big.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_tpch_q21" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM li l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.late
        |  AND EXISTS (
        |    SELECT 1 FROM li l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM li l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin,

    "q_tpch_q19" ->
      """SELECT p_brand,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand""".stripMargin,
  )
}
