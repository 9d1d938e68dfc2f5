package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Cleaning

/** Parity query surface — the reference's operator inventory (SURVEY §2.2,
  * §2.4, §2.6-2.8, §2.11) as driver-checkable (Spark, DuckDB-SQL) pairs over
  * the fixture tables.
  *
  * Determinism rules for oracle hash parity:
  *   - no terminal ORDER BY (the driver's checker sorts rows by all columns
  *     before comparing, so a presentation sort is pure overhead — it would
  *     be the dominant global exchange at 100×); the only kept sort is
  *     q_topk's, where LIMIT depends on order (TakeOrderedAndProject);
  *   - double aggregates are rounded (sums 2dp, avgs 4dp) so parallel
  *     summation order can't surface in the hash;
  *   - derived integer columns are cast to long/BIGINT on both sides.
  *
  * Scale notes: every query is a single Catalyst plan — partial+final hash
  * aggregation (map-side combine), filter/projection pushdown into parquet,
  * TakeOrderedAndProject for top-k (no full sort). No collects.
  */
object Parity {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: TPC-H Q1 shape — scan, filter pushdown, projection, 8-way
    // multi-aggregate, sort. (Reference A1-A3 single-pass style at
    // data_validator.py:88-98, on the lineitem fixture.)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // A1: bare row count (the validator's MIN_EXPECTED_ROWS probe).
    "q_row_count" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))),

    // A1+A2+A3 in ONE pass — the validator's single multi-aggregate
    // statement (data_validator.py:88-98) shape: count, 3× exact
    // COUNT(DISTINCT), 2× COUNTIF-null.
    "q_validate_metrics" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        countDistinct(col("o_orderpriority")).as("n_priority"),
        countDistinct(col("o_custkey")).as("n_customers"),
        count(when(col("o_totalprice").isNull, true)).as("nulls_totalprice"),
        count(when(col("o_orderdate").isNull, true)).as("nulls_orderdate"))),

    // Column profiling: the statistical-aggregate family (correlation,
    // covariance, regression fit, higher moments) a data-quality layer
    // computes per segment — ONE hash-aggregate pass over the fact table,
    // same partial/final shape as the validation metrics above. Engine
    // formula note: Spark's skewness/kurtosis are the POPULATION moments;
    // DuckDB's skewness is sample-adjusted and its kurtosis_pop is the
    // population one — the query converts skewness to the sample form
    // (g1·√(n(n−1))/(n−2)) so both sides state the same statistic, and the
    // oracle uses kurtosis_pop directly. Everything rounds before compare
    // (aggregate merge order is engine-specific at the ulp level).
    "q_stats_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
            .as("covar_qty_price"),
          round(stddev_samp(col("l_discount")), 4).as("sd_discount"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope_price_qty"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4)
            .as("r2_price_qty"),
          round(kurtosis(col("l_quantity")), 4).as("kurt_qty"),
          skewness(col("l_quantity")).as("skew_pop"))
        .withColumn("skew_qty",
          round(col("skew_pop") * sqrt(col("n") * (col("n") - 1)) /
            (col("n") - 2), 4))
        .drop("skew_pop")
    }),

    // Equi-width histogram: the distribution profile a validator renders
    // next to the moment statistics above — fixed-width buckets (no
    // data-dependent bounds, so no extra pass), one hash-agg whose output
    // cardinality is the bucket count, not the row count. min/max per
    // bucket are exact data values — no rounding needed for engine parity.
    "q_histogram" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))),

    // k-anonymity audit (Sweeney 2002) over the quasi-identifier pair
    // (nation, market segment) with k = 10 and a generalization ladder:
    // level 0 if the full QI group already has ≥ k members, level 1 if
    // suppressing the segment (nation-only) reaches k, else 2 (suppress
    // both). One hash-agg for the groups plus a nation-partitioned window
    // sum for the generalized count — no second scan of the base table,
    // no row-level output (the audit is group-sized, tiny at any scale).
    "q_k_anonymity" -> ((s, dir) => {
      val g = t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_n"))
      val natW = Window.partitionBy(col("c_nationkey"))
      g.withColumn("nation_n", sum(col("group_n")).over(natW))
        .select(col("c_nationkey"), col("c_mktsegment"), col("group_n"),
          when(col("group_n") >= 10, lit(0L))
            .when(col("nation_n") >= 10, lit(1L))
            .otherwise(lit(2L)).as("anon_level"))
    }),

    // l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    // completion: a group can be k-large yet leak the sensitive value if
    // every member shares it. Same QI pair (nation, segment), sensitive
    // attribute = the 1000-wide account-balance band; distinct l >= 3 is
    // the verdict. One hash-agg (count + distinct-count of the band in a
    // single pass), group-sized output at any scale.
    "q_l_diversity" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_n"),
          countDistinct(floor(col("c_acctbal") / 1000).cast("long"))
            .as("l_distinct"))
        .withColumn("diverse", col("l_distinct") >= 3)),

    // t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    // rung of the privacy ladder: a group can be l-diverse yet skewed
    // far from the global sensitive distribution. For the ORDERED
    // sensitive attribute (the 1000-wide balance band), the earth-mover
    // distance collapses to the mean absolute cumulative gap:
    // t(g) = Σ_b |cum_g(b)·N − cum(b)·N_g| / (N_g·N·(m−1)). Computed as
    // an exact integer numerator sum (cross-multiplied cumulative
    // counts — no per-band division, so the fold order can't drift) into
    // ONE IEEE division, rounded 6. Shape: one (QI, band) hash-agg, a
    // band-sized global table broadcast back, cumulative sums by
    // QI-partitioned window — group×band-sized throughout.
    "q_t_closeness" -> ((s, dir) => {
      val bands = t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("band"))
        .agg(count(lit(1)).as("bn"))
      // Global per-band counts and the full (group × observed-band)
      // grid, so cumulative sums see every band in every group.
      val glob = bands.groupBy(col("band")).agg(sum(col("bn")).as("gn"))
      val groups = bands.select(col("c_nationkey"), col("c_mktsegment"))
        .distinct()
      val grid = groups.crossJoin(broadcast(glob))
        .join(bands, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .withColumn("bn", coalesce(col("bn"), lit(0L)))
      val wg = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
        .orderBy(col("band"))
      val wAll = Window.partitionBy(col("c_nationkey"),
        col("c_mktsegment"))
      val cum = grid
        .withColumn("cum_g", sum(col("bn")).over(wg))
        .withColumn("cum", sum(col("gn")).over(wg))
        .withColumn("ng", sum(col("bn")).over(wAll))
        .withColumn("m", count(lit(1)).over(wAll))
      val n = glob.agg(sum(col("gn")).as("nn"))
      cum.crossJoin(broadcast(n))
        .withColumn("num",
          abs(col("cum_g") * col("nn") - col("cum") * col("ng")))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("ng"),
          col("m"), col("nn"))
        .agg(sum(col("num")).as("numsum"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("ng").as("group_n"),
          // ng = 0 can only happen for a group whose every band key is
          // null (join keys never match) — t-closeness of an empty
          // distribution is reported 0 like the single-band case, and
          // the guard keeps ANSI division-by-zero out of the plan.
          when(col("m") > 1 && col("ng") > 0,
            round(col("numsum").cast("double") /
              (col("ng") * col("nn") * (col("m") - 1)), 6))
            .otherwise(0.0).as("t_closeness"))
    }),

    // A4: exact dedup == SELECT DISTINCT (survivor identity immaterial).
    "q_dedup_exact" -> ((s, dir) =>
      Cleaning.dedupExact(
        t(s, dir, "lineitem").select("l_returnflag", "l_linestatus"))),

    // A5: duplicate count = count − distinct-count, one aggregate pass.
    // Distinct over ONE struct, not a column list: multi-arg COUNT(DISTINCT)
    // skips null-bearing tuples while DuckDB's (a,b) struct counts them —
    // the struct form is null-safe AND hash-matches the oracle.
    "q_dup_count" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        (count(lit(1)) -
          countDistinct(struct(col("o_orderstatus"), col("o_orderpriority"))))
          .as("dup_rows"))),

    // A5 detail: per-group duplicate multiplicities (GROUP BY … HAVING>1).
    "q_dup_groups" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)),

    // F1-F3: the cleaning projection — fill-then-lower-then-trim on strings
    // (exact reference order, data_loader.py:331-332) + numeric zero-fill.
    "q_cleaning" -> ((s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("l_quantity"), lit(0.0)).as("qty_filled"),
        Cleaning.cleanedString(col("l_returnflag")).as("flag_clean"),
        Cleaning.cleanedString(col("l_linestatus")).as("status_clean"))),

    // P5: range-check violation set (values outside [5, 45]; rows reported,
    // not dropped — warn-only semantics).
    "q_range_violations" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") < 5 || col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // P4: cross-table logical consistency — lineitems shipped before their
    // order date (the yearstart>yearend analog over the fixtures).
    "q_consistency_violations" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") < col("o_orderdate"))
        .select("l_orderkey", "l_linenumber")
    }),

    // U1: union + dedup of two violation sets (reference's anomaly concat,
    // minus its NameError bug).
    "q_union_dedup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") > 49)
        .select("l_orderkey", "l_linenumber")
      val b = li.filter(col("l_discount") > 0.09)
        .select("l_orderkey", "l_linenumber")
      a.unionByName(b).dropDuplicates()
    }),

    // O: top-k — Catalyst plans TakeOrderedAndProject (no full sort).
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    // Skyline / Pareto front (Börzsönyi et al. 2001, "The Skyline
    // Operator"): the parts no other part beats on BOTH price (lower
    // better) and size (higher better) — multi-objective shortlisting
    // with no weighting dial. Exact points collapse first (duplicates
    // can't dominate each other), then TWO window passes instead of the
    // textbook quadratic self-join: within a fixed-width price bucket,
    // order (price asc, size desc) and drop any point whose running
    // preceding max size ≥ its own (on DISTINCT points this is exactly
    // the dominance test — a preceding equal size must be strictly
    // cheaper); survivors (per-bucket fronts, tiny) take the same test
    // globally. Local-then-global is lossless: a point dominated
    // anywhere is dominated inside its own bucket or by a survivor.
    // The oracle runs the NOT EXISTS quadratic definition — equality
    // proves the window formulation, not just the arithmetic. Shape:
    // one hash-agg + one bucket-partitioned window; nothing global
    // touches more than the per-bucket fronts.
    "q_skyline" -> ((s, dir) => {
      val pts = t(s, dir, "part")
        .groupBy(col("p_retailprice").as("price"),
          col("p_size").cast("long").as("psize"))
        .agg(count(lit(1)).as("n_parts"),
          min(col("p_partkey")).as("first_partkey"))
      def front(df: DataFrame, parts: Seq[Column]): DataFrame = {
        val w = Window.partitionBy(parts: _*)
          .orderBy(col("price").asc, col("psize").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn("m", max(col("psize")).over(w))
          .filter(col("m").isNull || col("m") < col("psize"))
          .drop("m")
      }
      val local = front(pts.withColumn("bkt", floor(col("price") / 100)),
        Seq(col("bkt"))).drop("bkt")
      front(local, Seq.empty)
    }),

    // F4/F5 adjacent: date-part extraction + monthly aggregate.
    "q_date_parts" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))),

    // S10: the warehouse query source as SQL TEXT — spark.sql over direct
    // file relations (`parquet.`path``), the reference's `client.query(sql)`
    // shape. Self-contained: no temp-view registration, so the query is
    // reentrant and can't race another invocation re-pointing a shared
    // view name at a different fixture dir.
    "q_sql_text" -> ((s, dir) =>
      s.sql(s"""SELECT c_mktsegment, count(*) AS n_orders,
               |  round(sum(o_totalprice), 2) AS revenue
               |FROM parquet.`$dir/orders.parquet` o
               |JOIN parquet.`$dir/customer.parquet` c
               |  ON o.o_custkey = c.c_custkey
               |GROUP BY c_mktsegment""".stripMargin)),

    // Set ops (SURVEY §2.7): INTERSECT/EXCEPT with SQL distinct semantics.
    "q_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val y94 = o.filter(year(col("o_orderdate")) === 1994).select("o_custkey")
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      y94.intersect(y95)
    }),

    "q_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val y94 = o.filter(year(col("o_orderdate")) === 1994).select("o_custkey")
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      y94.except(y95)
    }),

    // Bag (multiset) set ops — the ALL variants preserve multiplicity, so
    // the per-group counts of the result ARE the multiplicity arithmetic
    // (n_A - n_B for EXCEPT ALL, min for INTERSECT ALL): aggregating
    // afterwards keeps the compare small while pinning exactly the
    // semantics that distinguish ALL from DISTINCT.
    "q_except_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select("o_orderpriority")
        .exceptAll(o.filter(col("o_totalprice") > 100000)
          .select("o_orderpriority"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    }),

    "q_intersect_all" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select("o_orderpriority")
        .intersectAll(o.filter(col("o_totalprice") > 100000)
          .select("o_orderpriority"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    }),

    // Exact interpolated percentiles per group (single sort-based aggregate;
    // at 100 TB swap to approx_percentile behind the same column names).
    "q_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("o_totalprice"), lit(0.95)), 4).as("p95"),
          count(lit(1)).as("n"))),

    // The 100 TB dial the q_percentiles comment promises: the same two
    // quantiles from the approx_percentile sketch (O(accuracy) buffer per
    // group). Bounded-comparison oracle, same contract as
    // q_winsorize_approx: accuracy=10000 bounds rank error to n/10000, so
    // the fraction of rows at or below each approx quantile must sit in a
    // narrow band around the target rank — emitted as booleans DuckDB
    // predicts as constants, anchored by the exact per-group count.
    "q_percentiles_approx" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val q = o.groupBy(col("o_orderpriority"))
        .agg(percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("qs"))
        .select(col("o_orderpriority"), col("qs")(0).as("p50"),
          col("qs")(1).as("p95"))
      o.join(broadcast(q), "o_orderpriority")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          count_if(col("o_totalprice") <= col("p50")).as("le50"),
          count_if(col("o_totalprice") <= col("p95")).as("le95"))
        .select(col("o_orderpriority"), col("n"),
          (col("le50") / col("n")).between(0.48, 0.52).as("p50_ok"),
          (col("le95") / col("n")).between(0.93, 0.97).as("p95_ok"))
    }),

    // Ordered string aggregation (LISTAGG/string_agg): the report/export
    // shape — values sorted INSIDE the aggregate so the result is a pure
    // function of the set, not of partition arrival order (an unsorted
    // collect_list is engine- and run-nondeterministic by construction).
    // collect_list is the one agg whose state grows with group size: fine
    // for bounded groups like these; at 100 TB cap or pre-aggregate first.
    "q_string_agg" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_segments"),
          concat_ws(",",
            sort_array(collect_set(col("c_mktsegment")))).as("segments"))),

    // Boolean/conditional aggregate family: every/any/count_if — the
    // data-quality predicates (validator checks) as native aggregates in
    // one pass.
    "q_bool_aggs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0).as("all_qty_positive"),
          bool_or(col("l_discount") > 0.09).as("any_deep_discount"),
          count_if(col("l_tax") === 0).as("n_tax_free"))),

    // Schema-drift union (UNION ALL BY NAME): two projections with
    // different column sets merge by NAME, absent columns null-filled —
    // the shape every multi-batch ingest hits once the upstream schema
    // evolves (SURVEY §2.7 / Evolution's read-side twin). Positional
    // union would silently misalign columns; unionByName is the only
    // safe verb once schemas drift.
    "q_union_by_name" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val full = o.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), lit("full").as("src"))
      val open = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_orderpriority"),
          lit("open").as("src"))
      full.unionByName(open, allowMissingColumns = true)
    }),

    // Z-score standardization + outlier extraction — the feature-scaling
    // pass a training pipeline runs before model ingest. Deliberately NOT
    // a window over the value column: per-group moments come from one
    // hash-agg (3 rows), broadcast back, and the score is a codegen'd
    // projection — no sort, no single giant window partition. At 100 TB
    // the window formulation would funnel each group through one task;
    // this one is two scans and zero wide shuffles.
    "q_zscore" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val stats = li.groupBy(col("l_returnflag"))
        .agg(avg(col("l_extendedprice")).as("mu"),
          stddev_samp(col("l_extendedprice")).as("sd"))
      // 1.6, not the textbook 3: prices are uniform-ish (max |z| ≈ 1.74),
      // so a 3-sigma cut would select nothing and gate nothing.
      li.join(broadcast(stats), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          ((col("l_extendedprice") - col("mu")) / col("sd")).as("z"))
        .filter(abs(col("z")) > 1.6)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(col("z"), 4).as("z"))
    }),

    // Winsorization: clip each group's tail values to its own [p05, p95]
    // — the outlier treatment training pipelines apply before a model
    // sees the feature. Same two-pass shape as q_zscore: the per-group
    // quantile pair is one (sort-based, group-local) aggregate of 3 rows,
    // broadcast back; the clip is a codegen'd least/greatest projection.
    // Reports mean-before/after + clip counts per group — the audit line
    // a curation run logs.
    "q_winsorize" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val q = li.groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"), lit(0.05)).as("lo"),
          percentile(col("l_extendedprice"), lit(0.95)).as("hi"))
      li.join(broadcast(q), "l_returnflag")
        .select(col("l_returnflag"), col("l_extendedprice"),
          greatest(col("lo"), least(col("hi"), col("l_extendedprice")))
            .as("clipped"),
          (col("l_extendedprice") < col("lo")).as("clip_lo"),
          (col("l_extendedprice") > col("hi")).as("clip_hi"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          count_if(col("clip_lo")).as("n_clip_lo"),
          count_if(col("clip_hi")).as("n_clip_hi"),
          round(avg(col("l_extendedprice")), 4).as("mean_raw"),
          round(avg(col("clipped")), 4).as("mean_winsorized"))
    }),

    // The production twin of q_winsorize: approx_percentile instead of
    // exact percentile. Spark's exact percentile is a
    // TypedImperativeAggregate buffering a per-group value→count map —
    // memory-unbounded in the value domain's cardinality — while
    // approx_percentile's KLL-style sketch buffers O(accuracy) per group
    // no matter how many distinct values flow through (pinned in
    // PlanSpec). The oracle is a bounded comparison: accuracy=10000
    // bounds rank error to n/10000, so the fraction of rows outside the
    // approx [p05, p95] must land in [0.04, 0.06] per tail — the query
    // emits that CHECK as booleans, the oracle supplies the constants
    // they must equal, and the exact per-group counts anchor the rest.
    "q_winsorize_approx" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val q = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.05), lit(0.95)), lit(10000)).as("qb"))
        .select(col("l_returnflag"), col("qb")(0).as("lo"),
          col("qb")(1).as("hi"))
      li.join(broadcast(q), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          count_if(col("l_extendedprice") < col("lo")).as("below"),
          count_if(col("l_extendedprice") > col("hi")).as("above"))
        .select(col("l_returnflag"), col("n"),
          (col("below") / col("n")).between(0.04, 0.06).as("lo_ok"),
          (col("above") / col("n")).between(0.04, 0.06).as("hi_ok"))
    }),

    // Grouping sets: CUBE (all key combinations via one Expand).
    "q_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("revenue"))),

    // Explicit GROUPING SETS (the general form cube/rollup specialize):
    // two hand-picked sets — by status and by priority — in ONE Expand
    // pass, plus grouping_id to disambiguate which set a row came from
    // (the NULL-vs-grouped distinction CUBE readers need). SQL text: the
    // DataFrame API has no grouping-sets verb.
    // gid from explicit grouping() bits, not grouping_id(): the packed
    // form's bit order is an engine convention; the spelled-out arithmetic
    // is identical everywhere.
    "q_grouping_sets" -> ((s, dir) =>
      s.sql(s"""SELECT o_orderstatus, o_orderpriority,
               |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
               |    AS BIGINT) AS gid,
               |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue
               |FROM parquet.`$dir/orders.parquet`
               |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
               |""".stripMargin)),

    // Pivot: status columns per priority (explicit value list so the output
    // schema is static — an unpinned pivot would scan once just to discover
    // columns); empty cells coalesce to 0 to match COUNT(CASE …) semantics.
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))),

    // Unpivot (wide → long): the inverse reshape of q_pivot — one Expand
    // node, map-side only, no shuffle. lineitem's three charge columns melt
    // to (measure, value) rows.
    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
          "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "value")
        // SQL-standard UNPIVOT (and the DuckDB twin) EXCLUDES null values;
        // Spark's Dataset.unpivot keeps them — align explicitly rather than
        // relying on the fixture's charge columns being null-free.
        .filter(col("value").isNotNull)),

    // Grouping sets: ROLLUP over the star schema (free via Catalyst Expand).
    "q_rollup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // Z-order (Morton) data layout — the multi-dimension clustering move
    // behind Delta/Iceberg OPTIMIZE ZORDER: interleave the bits of the
    // two filter dimensions so range predicates on EITHER dimension map
    // to a bounded set of contiguous files, instead of a linear sort
    // that serves only its leading column. Pure integer bit arithmetic
    // (16-bit magic-mask spread + interleave — identical << & | ops on
    // both engines, zero drift); file assignment is rank div 500 over
    // the z key via ext/GlobalRank (no single-partition window at
    // scale); output is each file's min/max zone map per dimension —
    // exactly the footer stats a 100 TB scan would prune on.
    "q_zorder_layout" -> ((s, dir) =>
      zorderFileStats(zorderBase(s, dir), Seq(col("z"),
        col("l_orderkey"), col("l_linenumber")), "zorder")
        .select(col("file_id"), col("n_rows"), col("min_pk"),
          col("max_pk"), col("min_sk"), col("max_sk"))),

    // The measurement that justifies the layout: for ten diagonal
    // decile-box probes (one tenth of each dimension's range), count the
    // files whose zone maps intersect the probe under the z-order layout
    // vs the linear (pk, sk) sort — the fraction of files a pruning scan
    // must touch. Z-order should touch strictly fewer files on probes
    // away from the linear sort's leading-column prefix; the oracle
    // recomputes both layouts and the probe overlap exactly.
    "q_zorder_skipping" -> ((s, dir) => {
      val base = zorderBase(s, dir).localCheckpoint()
      val stats = zorderFileStats(base, Seq(col("z"), col("l_orderkey"),
          col("l_linenumber")), "zorder")
        .unionAll(zorderFileStats(base, Seq(col("pk"), col("sk"),
          col("l_orderkey"), col("l_linenumber")), "linear"))
        .localCheckpoint()
      val bounds = base.agg(min(col("pk")).as("pmin"),
        max(col("pk")).as("pmax"), min(col("sk")).as("smin"),
        max(col("sk")).as("smax"))
        .withColumn("wp", expr("((pmax - pmin) div 10) + 1"))
        .withColumn("ws", expr("((smax - smin) div 10) + 1"))
      val probes = s.range(10).select(col("id").as("probe_id"))
        .crossJoin(broadcast(bounds))
        .select(col("probe_id"),
          (col("pmin") + col("probe_id") * col("wp")).as("plo"),
          (col("pmin") + col("probe_id") * col("wp") + col("wp") - 1)
            .as("phi"),
          (col("smin") + col("probe_id") * col("ws")).as("slo"),
          (col("smin") + col("probe_id") * col("ws") + col("ws") - 1)
            .as("shi"))
      val grid = stats.select(col("layout")).distinct().crossJoin(probes)
      val totals = stats.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"))
      val st = stats.select(col("layout").as("l2"), col("file_id"),
        col("min_pk"), col("max_pk"), col("min_sk"), col("max_sk"))
      grid.join(st, col("layout") === col("l2") &&
          col("min_pk") <= col("phi") && col("max_pk") >= col("plo") &&
          col("min_sk") <= col("shi") && col("max_sk") >= col("slo"),
          "left")
        .groupBy(col("layout"), col("probe_id"))
        .agg(sum(when(col("file_id").isNotNull, 1L).otherwise(0L))
          .as("files_touched"))
        .join(totals, Seq("layout"))
    }),
  )

  /** 16-bit magic-mask bit spread (x -> x with a zero bit between every
    * data bit) — the classic Morton-code dilation, identical integer ops
    * on both engines.
    */
  private def mortonSpread(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(65535L))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(16711935L))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(252645135L))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(858993459L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit Morton interleave of two 16-bit keys (a in even bits, b in
    * odd bits).
    */
  private def zorder16(a: Column, b: Column): Column =
    mortonSpread(a).bitwiseOR(shiftleft(mortonSpread(b), 1))

  /** The z-order family's shared base: lineitem keyed by (partkey,
    * suppkey) with the Morton key attached — one codegen'd projection.
    */
  private def zorderBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey").cast("long").as("pk"),
      col("l_suppkey").cast("long").as("sk"))
      .withColumn("z", zorder16(col("pk"), col("sk")))

  /** 500-row files under the given total order (unique via the
    * (orderkey, linenumber) tiebreak) with per-file zone maps. Global
    * rank comes from ext/GlobalRank — range-repartition + broadcast
    * partition offsets, never a single-partition window.
    */
  private def zorderFileStats(base: DataFrame, keys: Seq[Column],
      layout: String): DataFrame = {
    val (ranked, _) = graft.ext.GlobalRank.withGlobalRowNumberAdaptive(
      base, "rn", keys: _*)
    ranked.withColumn("file_id", expr("(rn - 1) div 500"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pk")).as("min_pk"), max(col("pk")).as("max_pk"),
        min(col("sk")).as("min_sk"), max(col("sk")).as("max_sk"))
      .withColumn("layout", lit(layout))
  }

  /** DuckDB twin of the Morton chain + z-order file stats: the same
    * magic-mask dilation constants, the same (z, orderkey, linenumber)
    * total order, rank // 500 files, per-file zone maps. Declared BEFORE
    * the oracles map (same-object forward reference would init to null).
    */
  private val zorderCtes: String =
    """zb AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(l_partkey AS BIGINT) AS pk, CAST(l_suppkey AS BIGINT) AS sk
      |  FROM lineitem),
      |z1 AS (SELECT l_orderkey, l_linenumber, pk, sk,
      |  pk & 65535 AS xa, sk & 65535 AS xb FROM zb),
      |z2 AS (SELECT l_orderkey, l_linenumber, pk, sk,
      |  ((xa | (xa << 8)) & 16711935) AS xa,
      |  ((xb | (xb << 8)) & 16711935) AS xb FROM z1),
      |z3 AS (SELECT l_orderkey, l_linenumber, pk, sk,
      |  ((xa | (xa << 4)) & 252645135) AS xa,
      |  ((xb | (xb << 4)) & 252645135) AS xb FROM z2),
      |z4 AS (SELECT l_orderkey, l_linenumber, pk, sk,
      |  ((xa | (xa << 2)) & 858993459) AS xa,
      |  ((xb | (xb << 2)) & 858993459) AS xb FROM z3),
      |z5 AS (SELECT l_orderkey, l_linenumber, pk, sk,
      |  ((xa | (xa << 1)) & 1431655765) AS xa,
      |  ((xb | (xb << 1)) & 1431655765) AS xb FROM z4),
      |zt AS (SELECT l_orderkey, l_linenumber, pk, sk,
      |  (xa | (xb << 1)) AS z FROM z5),
      |zf AS (
      |  SELECT (row_number() OVER (ORDER BY z, l_orderkey,
      |    l_linenumber) - 1) // 500 AS file_id, pk, sk
      |  FROM zt),
      |zstats AS (
      |  SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
      |    min(pk) AS min_pk, max(pk) AS max_pk,
      |    min(sk) AS min_sk, max(sk) AS max_sk
      |  FROM zf GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_zorder_layout" ->
      s"""WITH $zorderCtes
        |SELECT file_id, n_rows, min_pk, max_pk, min_sk, max_sk
        |FROM zstats""".stripMargin,

    "q_zorder_skipping" ->
      s"""WITH $zorderCtes,
        |lf AS (
        |  SELECT (row_number() OVER (ORDER BY pk, sk, l_orderkey,
        |    l_linenumber) - 1) // 500 AS file_id, pk, sk
        |  FROM zb),
        |lstats AS (
        |  SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
        |    min(pk) AS min_pk, max(pk) AS max_pk,
        |    min(sk) AS min_sk, max(sk) AS max_sk
        |  FROM lf GROUP BY 1),
        |stats AS (
        |  SELECT 'zorder' AS layout, * FROM zstats
        |  UNION ALL SELECT 'linear', * FROM lstats),
        |bounds AS (
        |  SELECT min(pk) AS pmin, max(pk) AS pmax,
        |    min(sk) AS smin, max(sk) AS smax,
        |    ((max(pk) - min(pk)) // 10) + 1 AS wp,
        |    ((max(sk) - min(sk)) // 10) + 1 AS ws
        |  FROM zb),
        |probes AS (
        |  SELECT b AS probe_id, pmin + b * wp AS plo,
        |    pmin + b * wp + wp - 1 AS phi, smin + b * ws AS slo,
        |    smin + b * ws + ws - 1 AS shi
        |  FROM range(10) t(b), bounds),
        |grid AS (
        |  SELECT l.layout, p.* FROM
        |    (SELECT DISTINCT layout FROM stats) l, probes p),
        |tot AS (SELECT layout, CAST(count(*) AS BIGINT) AS n_files
        |        FROM stats GROUP BY 1)
        |SELECT g.layout, CAST(g.probe_id AS BIGINT) AS probe_id,
        |  CAST(sum(CASE WHEN s.file_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS files_touched,
        |  t.n_files
        |FROM grid g
        |LEFT JOIN stats s ON s.layout = g.layout
        |  AND s.min_pk <= g.phi AND s.max_pk >= g.plo
        |  AND s.min_sk <= g.shi AND s.max_sk >= g.slo
        |JOIN tot t ON t.layout = g.layout
        |GROUP BY 1, 2, t.n_files""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_row_count" -> "SELECT count(*) AS n_rows FROM lineitem",

    "q_validate_metrics" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  count(DISTINCT o_orderpriority) AS n_priority,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS nulls_totalprice,
        |  count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS nulls_orderdate
        |FROM orders""".stripMargin,

    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS group_n
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, group_n,
        |  CAST(CASE WHEN group_n >= 10 THEN 0
        |    WHEN sum(group_n) OVER (PARTITION BY c_nationkey) >= 10 THEN 1
        |    ELSE 2 END AS BIGINT) AS anon_level
        |FROM g""".stripMargin,

    "q_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS group_n,
        |  CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |    AS BIGINT) AS l_distinct,
        |  count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 3
        |    AS diverse
        |FROM customer GROUP BY 1, 2""".stripMargin,

    // Same exact-integer EMD numerator (cross-multiplied cumulative
    // counts), one division, round 6.
    "q_t_closeness" ->
      """WITH bnd AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
        |    count(*) AS bn
        |  FROM customer GROUP BY 1, 2, 3),
        |gl AS (SELECT band, sum(bn) AS gn FROM bnd GROUP BY 1),
        |gr AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM bnd),
        |grid AS (
        |  SELECT g.c_nationkey, g.c_mktsegment, gl.band, gl.gn,
        |    COALESCE(b.bn, 0) AS bn
        |  FROM gr g CROSS JOIN gl
        |  LEFT JOIN bnd b ON b.c_nationkey = g.c_nationkey
        |    AND b.c_mktsegment = g.c_mktsegment AND b.band = gl.band),
        |cum AS (
        |  SELECT c_nationkey, c_mktsegment, band, gn, bn,
        |    sum(bn) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band) AS cum_g,
        |    sum(gn) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY band) AS cum,
        |    sum(bn) OVER (PARTITION BY c_nationkey, c_mktsegment) AS ng,
        |    count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS m
        |  FROM grid),
        |tot AS (SELECT sum(gn) AS nn FROM gl)
        |SELECT c_nationkey, c_mktsegment, CAST(ng AS BIGINT) AS group_n,
        |  CASE WHEN m > 1 AND ng > 0 THEN
        |    round(CAST(sum(abs(cum_g * nn - cum * ng)) AS DOUBLE)
        |      / (ng * nn * (m - 1)), 6)
        |  ELSE 0.0 END AS t_closeness
        |FROM cum, tot GROUP BY 1, 2, ng, m, nn""".stripMargin,

    "q_stats_profile" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2)
        |    AS covar_qty_price,
        |  round(stddev_samp(l_discount), 4) AS sd_discount,
        |  round(regr_slope(l_extendedprice, l_quantity), 4)
        |    AS slope_price_qty,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2_price_qty,
        |  round(kurtosis_pop(l_quantity), 4) AS kurt_qty,
        |  round(skewness(l_quantity), 4) AS skew_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1""".stripMargin,

    "q_string_agg" ->
      """SELECT c_nationkey, count(*) AS n_segments,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
        |    AS segments
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "q_bool_aggs" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_qty_positive,
        |  bool_or(l_discount > 0.09) AS any_deep_discount,
        |  count(CASE WHEN l_tax = 0 THEN 1 END) AS n_tax_free
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_union_by_name" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, 'full' AS src
        |FROM orders
        |UNION ALL BY NAME
        |SELECT o_orderkey, o_orderpriority, 'open' AS src
        |FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "q_zscore" ->
      """WITH stats AS (
        |  SELECT l_returnflag, avg(l_extendedprice) AS mu,
        |    stddev_samp(l_extendedprice) AS sd
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, l.l_returnflag,
        |  round((l_extendedprice - mu) / sd, 4) AS z
        |FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
        |WHERE abs((l_extendedprice - mu) / sd) > 1.6""".stripMargin,

    "q_dedup_exact" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_dup_count" ->
      """SELECT count(*) - count(DISTINCT (o_orderstatus, o_orderpriority))
        |  AS dup_rows
        |FROM orders""".stripMargin,

    "q_dup_groups" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |HAVING count(*) > 1
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q_cleaning" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(l_quantity, 0.0) AS qty_filled,
        |  trim(lower(coalesce(l_returnflag, 'Unknown'))) AS flag_clean,
        |  trim(lower(coalesce(l_linestatus, 'Unknown'))) AS status_clean
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_range_violations" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity < 5 OR l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_consistency_violations" ->
      """SELECT l_orderkey, l_linenumber
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate < o_orderdate
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_union_dedup" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 49
        |UNION
        |SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.09
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    // The quadratic textbook definition — an INDEPENDENT formulation, so
    // equality proves the Spark side's bucketed window decomposition.
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT p_retailprice AS price, CAST(p_size AS BIGINT) AS psize,
        |    count(*) AS n_parts, min(p_partkey) AS first_partkey
        |  FROM part GROUP BY 1, 2)
        |SELECT price, psize, n_parts, first_partkey FROM pts a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts b
        |  WHERE b.price <= a.price AND b.psize >= a.psize
        |    AND (b.price < a.price OR b.psize > a.psize))""".stripMargin,

    "q_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,

    "q_sql_text" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995"""
        .stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995"""
        .stripMargin,

    "q_except_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000)
        |GROUP BY 1""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_orderpriority, count(*) AS n FROM (
        |  SELECT o_orderpriority FROM orders
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000)
        |GROUP BY 1""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_percentiles_approx" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(1 AS BOOLEAN) AS p50_ok, CAST(1 AS BOOLEAN) AS p95_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_winsorize" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        |  count(CASE WHEN l_extendedprice < lo THEN 1 END) AS n_clip_lo,
        |  count(CASE WHEN l_extendedprice > hi THEN 1 END) AS n_clip_hi,
        |  round(avg(l_extendedprice), 4) AS mean_raw,
        |  round(avg(greatest(lo, least(hi, l_extendedprice))), 4)
        |    AS mean_winsorized
        |FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
        |GROUP BY l.l_returnflag""".stripMargin,

    // Bounded-comparison oracle: DuckDB cannot see the sketch, but the
    // rank-error contract it must satisfy is a constant — per-group count
    // is exact, and both tail-fraction checks must come back true.
    "q_winsorize_approx" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(1 AS BOOLEAN) AS lo_ok, CAST(1 AS BOOLEAN) AS hi_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"""
        .stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
        |    AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"""
        .stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |        l_tax FROM lineitem)
        |UNPIVOT (value FOR measure IN (l_extendedprice, l_discount, l_tax))"""
        .stripMargin,

    "q_rollup" ->
      """SELECT r_name, n_name,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
  )
}
