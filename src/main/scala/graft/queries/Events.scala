package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

    // Top user-journey paths: per (user, day), event types in exact
    // (ts, event_id) order — collect_list is order-NONDETERMINISTIC
    // across partitions, so the array is sorted by a struct whose
    // leading fields are the unique (ts, event_id) key before the types
    // are projected out (deterministic even under timestamp ties) —
    // truncated to the first 8 steps, counted, top-20 by (n, path). One
    // shuffle to the (user, day) grain; path counting aggregates
    // journey-sized rows.
    "q_top_paths" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          struct(col("ts"), col("event_id"), col("event_type")).as("e"))
        .groupBy(col("user_id"), col("day"))
        .agg(concat_ws(">",
          slice(transform(array_sort(collect_list(col("e"))),
            x => x.getField("event_type")), 1, 8)).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_journeys"))
        .orderBy(col("n_journeys").desc, col("path").asc)
        .limit(20)),

    // A6 freshness gate under the oracle: per-stream age-hours of the
    // newest event against a 0.5 h SLA, evaluated at an INJECTED instant
    // (Checks.freshnessAt — same constant-injection pattern as the
    // incremental family's loaded_at) so the wall-clock check becomes
    // deterministic and DuckDB-comparable. At sf0.01 the outcome is
    // mixed: view/click pass, error/purchase/signup fail — the gate
    // actually gates. One hash-agg keyed by type; the metric expression
    // IS Checks.freshnessAt's, not a re-derivation.
    "q_freshness" -> ((s, dir) => {
      val chk = graft.engine.Checks.freshnessAt("ts", 0.5,
        to_timestamp(lit("2024-01-31 00:00:00")))
      // `passed` gates on the UNROUNDED metric — exactly what
      // Checks.freshnessAt's predicate sees; deriving it from the
      // 6-decimal display value would pass a 0.5000004 h age the real
      // check fails. (Both engines: floor'd epoch longs / 3600.0 — one
      // deterministic division — so the unrounded compare is engine-safe.)
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(chk.metric, 6).as("age_hours"),
          (chk.metric <= 0.5).as("passed"))
    }),

    // EWMA control chart (Roberts 1959; the streaming-friendly smoother
    // beside CUSUM's retrospective changepoint): per event type, the
    // exponentially weighted moving average of hourly volume with α = 1/2
    // truncated at 8 lags — dyadic weights 2^(7−i) make numerator and
    // denominator EXACT integer window sums over the cents-scaled hourly
    // totals (the q_cusum_changepoint idiom), so the only IEEE op is the
    // final readable division. Early hours renormalize over the weights
    // actually present (a proper weighted average from row 1, no warm-up
    // bias). The spike verdict compares this hour against 2× the PREVIOUS
    // hour's EWMA by integer cross-multiplication — zero float drift in
    // the decision. Shape: one hourly hash-agg, then one window pass;
    // partitions are (type, hours), never row-count-sized.
    "q_ewma_control" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(floor(round(sum(col("value")), 2) * 100 + 0.5).as("cents"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      def lagged(i: Int) =
        if (i == 0) col("cents") else lag(col("cents"), i).over(w)
      val num = (0 to 7).map(i =>
        coalesce(lagged(i), lit(0L)) * lit(1L << (7 - i))).reduce(_ + _)
      val den = (0 to 7).map(i =>
        when(lagged(i).isNotNull, lit(1L << (7 - i))).otherwise(lit(0L)))
        .reduce(_ + _)
      hourly
        .withColumn("num", num).withColumn("den", den)
        .withColumn("num_prev", lag(col("num"), 1).over(w))
        .withColumn("den_prev", lag(col("den"), 1).over(w))
        .select(col("event_type"), col("h"), col("cents"),
          // den = 0 only when every windowed hour's cents is null (an
          // all-null group) — report null, and keep ANSI div-by-zero
          // out of the plan.
          when(col("den") > 0,
            round(col("num") / (col("den") * 100.0), 4))
            .otherwise(lit(null).cast("double")).as("ewma"),
          coalesce(col("cents") * col("den_prev") > col("num_prev") * 2,
            lit(false)).as("spike"))
    }),

    // Changepoint localization (CUSUM, Page 1954): WHERE in time the
    // level of a series shifted — the companion to q_psi_drift's "did the
    // distribution move". Hourly value sums per type (integer cents), then
    // the classic cumulative-deviation statistic computed SCALE-FREE in
    // exact longs: cusum_t·n = n·Σ_{i≤t}x_i − t·Σx_i (multiplying through
    // by n avoids a float mean inside the cumsum — engine-exact), argmax
    // |cusum| with earliest-hour tiebreak. Windows run over the hourly
    // aggregate (≤ hours×types rows), never raw events.
    "q_cusum_changepoint" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(floor(round(sum(col("value")), 2) * 100 + 0.5).as("cents"))
      val tot = hourly.groupBy(col("event_type"))
        .agg(sum(col("cents")).as("tot"), count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val cus = hourly.join(broadcast(tot), "event_type")
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("cents")).over(w))
        .withColumn("cusum_scaled",
          col("n") * col("cum") - col("t") * col("tot"))
      val w2 = Window.partitionBy(col("event_type"))
        .orderBy(abs(col("cusum_scaled")).desc, col("h").asc)
      cus.withColumn("rn", row_number().over(w2))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("h").as("change_hour"),
          round(abs(col("cusum_scaled")) / (col("n") * lit(100.0)), 2)
            .as("max_cusum"),
          col("n").as("n_hours"))
    }),

    // Distribution-drift monitor: Population Stability Index of the value
    // distribution per event type, reference period (first half of the
    // month) vs current (second half). Fixed-width value bins (10 × 50,
    // top-clamped — deterministic across engines; a quantile grid is the
    // production dial via quantile_bucket), add-one smoothing over the
    // OBSERVED bin union so an empty cell on either side stays finite.
    // Shape: one scan → (type, bin) hash-agg with both period counts as
    // conditional sums in ONE pass, per-type totals as a tiny broadcast
    // join back; the PSI fold is ≤10 rows per type. The standard
    // monitoring thresholds (0.1 / 0.25) label the verdict.
    // Split-conformal prediction audit (Vovk et al. 2005; Angelopoulos &
    // Bates 2021): per event type, the model is the TRAIN-split value
    // mean, the nonconformity score is |value − mean|, q̂ is the
    // ⌈(n+1)·0.9⌉-th smallest calibration (val-split) score, and the
    // report is the TEST-split coverage of the interval mean ± q̂ — the
    // distribution-free ≥90% guarantee a deployed predictor's intervals
    // are audited against. All decisions are exact integers: the mean is
    // never materialized — score·n = |cents·n − Σcents| cross-multiplies
    // it away, the quantile index is the pure-integer ⌈9(n+1)/10⌉ =
    // (9(n+1)+9) div 10 (a float ·0.9 misrounds exact multiples), and
    // the test compare is integer-to-integer; the only IEEE ops are the
    // two display roundings. The quantile position clamps to n_cal when
    // the calibration set is smaller than ⌈(n+1)(1−α)⌉ demands (the
    // honest convention is q̂ = ∞; the clamp keeps the row defined and
    // is documented by n_cal beside it). Shape: one split pass, the
    // per-type train stats and q̂ ride as broadcast joins, ranks
    // partition by type — nothing global.
    "q_conformal_coverage" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("cents", floor(col("value") * 100 + 0.5))
        .withColumn("split", splitCol(col("event_id")))
      val train = ev.filter(col("split") === "train")
        .groupBy(col("event_type"))
        .agg(sum(col("cents")).as("tsum"), count(lit(1)).as("tn"))
      val cal = ev.filter(col("split") === "val")
        .join(broadcast(train), "event_type")
        .withColumn("ss", abs(col("cents") * col("tn") - col("tsum")))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("ss"))
      val wAll = Window.partitionBy(col("event_type"))
      val qhat = cal
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("n_cal", count(lit(1)).over(wAll))
        .filter(col("rn") ===
          least(expr("(9 * (n_cal + 1) + 9) div 10"), col("n_cal")))
        .select(col("event_type"), col("ss").as("qhat_scaled"),
          col("n_cal"), col("tn"), col("tsum"))
      ev.filter(col("split") === "test")
        .join(broadcast(qhat), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n_cal")).as("n_cal"),
          round(max(col("qhat_scaled")) / (max(col("tn")) * 100.0), 4)
            .as("qhat"),
          count(lit(1)).as("n_test"),
          sum(when(abs(col("cents") * col("tn") - col("tsum")) <=
            col("qhat_scaled"), 1L).otherwise(0L)).as("n_covered"))
        .withColumn("coverage",
          round(col("n_covered").cast("double") / col("n_test"), 4))
    }),

    // The PRODUCTION dial for q_conformal_coverage's q̂: at 100 TB a hot
    // event type's val slice is one task's exact-rank sort, so swap the
    // per-type rank window for approx_percentile's mergeable KLL-style
    // sketch (O(accuracy) state per type, one hash-agg, NO window — the
    // q_winsorize_approx precedent). The oracle cannot see the sketch;
    // what it CAN see is the contract the sketch must satisfy on the
    // rows it ran over: accuracy=10000 bounds rank error to
    // n_cal/10000, and the conformal index ⌈0.9(n_cal+1)⌉ sits within
    // one rank of the sketch's 0.9·n_cal target — so q̂_approx's rank
    // must land within tol = max(2, n_cal/1000) of 9(n_cal+1)/10. The
    // audit is TWO-SIDED over q̂'s tie group (integer-cents scores make
    // ties likely, and the sketch's guarantee is about SOME rank inside
    // the group, not the group's upper edge): pass iff
    // count(ss < q̂)·10 ≤ 9(n_cal+1) + 10·tol  AND
    // count(ss ≤ q̂)·10 ≥ 9(n_cal+1) − 10·tol — a one-sided
    // count(ss ≤ q̂) would bill the whole tie group to the target rank
    // and fail a correct sketch on a heavy tie. Both bounds integer
    // cross-multiplied (×100 clears the /1000 tolerance), no IEEE
    // division; plus the exact split counts as the oracle row.
    "q_conformal_approx" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("cents", floor(col("value") * 100 + 0.5))
        .withColumn("split", splitCol(col("event_id")))
      val train = ev.filter(col("split") === "train")
        .groupBy(col("event_type"))
        .agg(sum(col("cents")).as("tsum"), count(lit(1)).as("tn"))
      val cal = ev.filter(col("split") === "val")
        .join(broadcast(train), "event_type")
        .withColumn("ss", abs(col("cents") * col("tn") - col("tsum")))
        .localCheckpoint() // feeds the sketch agg AND the rank audit
      val qhat = cal.groupBy(col("event_type"))
        .agg(percentile_approx(col("ss"), lit(0.9), lit(10000))
          .as("qhat_scaled"))
      val audit = cal.join(broadcast(qhat), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_cal"),
          count_if(col("ss") < col("qhat_scaled")).as("r_lt"),
          count_if(col("ss") <= col("qhat_scaled")).as("r_le"),
          max(col("qhat_scaled")).as("qhat_scaled"))
      val nTest = ev.filter(col("split") === "test")
        .join(broadcast(train.select("event_type")), "event_type")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_test"))
      audit.join(nTest, "event_type")
        .select(col("event_type"), col("n_cal"), col("n_test"),
          (((col("r_lt") * 10 - (col("n_cal") + 1) * 9) * 100 <=
            greatest(lit(2000L), col("n_cal"))) &&
           (((col("n_cal") + 1) * 9 - col("r_le") * 10) * 100 <=
            greatest(lit(2000L), col("n_cal")))).as("rank_ok"))
    }),

    "q_psi_drift" -> ((s, dir) => {
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val g = t(s, dir, "events")
        .withColumn("bin", least(floor(col("value") / 50), lit(9L)))
        .groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("n_cur"))
      psiFold(g, "event_type", "n_events_ref", "n_events_cur")
        .withColumn("verdict", when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate").otherwise("shifted"))
    }),

    // Kolmogorov-Smirnov drift beside PSI: exact max |F_ref − F_cur| over
    // the OBSERVED value support per event type — no binning dial at all,
    // the sensitivity PSI's 10 bins can smooth away. One hash-agg to the
    // distinct (type, value) grain, running-count windows partitioned by
    // type, per-row rounded CDF gap, max. The verdict gates on the same
    // rounded metric both engines compute — not a display rounding.
    // Fold lives in Rollup.ksReport — ONE definition with the streaming
    // monitor (Streams.startKsW1Monitor), the psiFold posture.
    "q_ks_drift" -> ((s, dir) => {
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val g = t(s, dir, "events")
        .groupBy(col("event_type"), col("value"))
        .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("c_cur"))
      graft.engine.Rollup.ksReport(g, "event_type", "value")
    }),

    // Wasserstein-1 (earth mover) drift beside PSI's binned divergence
    // and KS's sup-norm: W1 = ∫|F_ref − F_cur| dx over the observed
    // cents-grid support — the drift measure that weighs HOW FAR the
    // mass moved, not just that it moved. Exact to the last bit: each
    // step's |F_ref − F_cur| is the cross-multiplied integer
    // |cum_ref·N_cur − cum_cur·N_ref|, scaled by the integer gap to the
    // next observed value and summed as longs (order-free); ONE IEEE
    // division at the end. The cross-multiply bound is
    // max(cum)·max(N)·gap ≲ 1e12 at fixture scale and needs ~N² ≤ 2^63
    // headroom in general — beyond ~3e9 rows per side, divide per step
    // in doubles instead (the documented trade). Same distinct-grain
    // shuffle + type-partitioned running windows as q_ks_drift.
    // Fold lives in Rollup.w1Report — ONE definition with the streaming
    // monitor (Streams.startKsW1Monitor), the psiFold posture.
    "q_wasserstein_drift" -> ((s, dir) => {
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val g = t(s, dir, "events")
        .withColumn("cents", floor(col("value") * 100 + 0.5))
        .groupBy(col("event_type"), col("cents"))
        .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("ts") >= cut, 1L).otherwise(0L)).as("c_cur"))
      graft.engine.Rollup.w1Report(g, "event_type", "cents")
    }),

    // Tumbling 1-hour window per event type (Spark's window() operator;
    // epoch-aligned buckets).
    "q_time_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(col("window.start").as("bucket"), col("event_type"),
          col("n"), col("total"))),

    // Gap-filled resample: hourly buckets per event_type INCLUDING empty
    // hours over each type's own [min, max] span — the dense series a
    // time-series consumer expects. The bucket spine is generated from a
    // per-type 1-row aggregate (sequence+explode: |types| × |hours| rows,
    // tiny next to the events themselves), then the sparse counts join in.
    "q_resample" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("bucket", date_trunc("hour", col("ts")))
      // ONE fact scan: the tiny (type, hour) count table is materialized
      // and feeds both the spine derivation and the gap-fill join.
      val counts = ev.groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n")).localCheckpoint()
      val spine = counts.groupBy(col("event_type"))
        .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("bucket"))
      spine.join(counts, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"),
          coalesce(col("n"), lit(0L)).as("n"))
    }),

    // Gap-fill + LOCF (last observation carried forward): the q_resample
    // spine, but empty hours inherit the most recent observed hourly total
    // via a running last(ignoreNulls) window — the standard interpolation
    // for downstream consumers that need a dense, never-null series
    // (feature stores, rate limiters). Window partitions by event_type
    // (bounded cardinality) over the ALREADY-AGGREGATED hourly table —
    // |types| × |hours| rows, not raw events — so the single-key window
    // task stays tiny at any corpus size.
    "q_locf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .withColumn("bucket", date_trunc("hour", col("ts")))
      val counts = ev.groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .localCheckpoint()
      val spine = counts.groupBy(col("event_type"))
        .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("bucket"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(counts, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("total"), ignoreNulls = true).over(w).as("filled_total"))
    }),

    // Per-group z-score outliers: two-level plan — per-type mean/stddev via
    // one aggregate, broadcast back (|types| rows), flag |z| > 2. The
    // textbook warehouse outlier sweep without a window over the fact table.
    "q_outliers" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val stats = ev.groupBy(col("event_type"))
        .agg(avg(col("value")).as("mu"),
          stddev_samp(col("value")).as("sigma"))
      // Membership filters on the ROUNDED |z|: the raw double depends on
      // each engine's aggregate merge order (ulp-level), so gating on it
      // would let a value straddling the threshold flip between engines;
      // after round(...,4) the filter and the displayed z see the same
      // number on both sides.
      ev.join(broadcast(stats), "event_type")
        .filter(col("sigma") > 0 &&
          round(abs(col("value") - col("mu")) / col("sigma"), 4) > 2)
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("value") - col("mu")) / col("sigma"), 4).as("z"))
    }),

    // Sliding 1-hour window, 30-minute slide: each event lands in 2 buckets
    // (Spark emits w/slide windows per row via Expand — map-side, no join).
    "q_time_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total"))),

    // Funnel analysis: users progressing view → click → purchase in strict
    // first-occurrence time order. ONE aggregate pass builds each user's
    // first-touch timestamps (conditional min — no self-joins, no windows),
    // then the stage counts are a 1-row fold: the product-analytics query
    // at its cheapest plan shape. At 100 TB this is a single shuffle keyed
    // by user_id with near-total map-side reduction.
    "q_funnel" -> ((s, dir) => {
      def firstOf(t: String) =
        min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
        .agg(count(lit(1)).as("n_users"),
          count(col("t_view")).as("stage_view"),
          count(when(col("t_click") > col("t_view"), true))
            .as("stage_click"),
          count(when(col("t_purchase") > col("t_click") &&
            col("t_click") > col("t_view"), true)).as("stage_purchase"))
    }),

    // Cohort retention: users bucketed by first-active week, counted per
    // week offset — the (cohort × offset) activity matrix. Two hash-aggs
    // on user-keyed data + a distinct count per matrix cell; cohort table
    // is |users| rows (broadcastable at any corpus size where users fit a
    // dim table, shuffled join otherwise).
    "q_retention" -> ((s, dir) => {
      // wk stays TIMESTAMP (Spark's date_trunc type) — the twin casts its
      // DATE-typed date_trunc back up so both engines emit one type.
      val activity = t(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
        .localCheckpoint()
      val cohort = activity.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      activity.join(cohort, "user_id")
        .groupBy(col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long")
            .as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    // Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    // (the classic streak query), via the row_number difference trick —
    // day minus dense day-rank is constant within a run, so one window +
    // one group-by finds every island without self-joins. The window
    // partitions by user_id (thousands of small partitions), never one
    // global sort; at 100 TB this is the per-entity-history shape that
    // scales linearly with users.
    "q_streaks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val days = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      days
        .withColumn("grp", date_sub(col("d"), row_number().over(w)))
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("d")).as("sd"), max(col("d")).as("ed"),
          count(lit(1)).as("len_days"))
        // TIMESTAMP on the wire (like q_retention): DuckDB DATE surfaces
        // as midnight timestamps through the checker's pandas bridge.
        .select(col("user_id"),
          col("sd").cast("timestamp").as("start_day"),
          col("ed").cast("timestamp").as("end_day"), col("len_days"))
    }),

    // Batch sessionization: 30-minute inactivity gap per user.
    "q_sessionize" -> ((s, dir) =>
      Sessionize.sessions(t(s, dir, "events"), "user_id", "ts",
          tieBreak = "event_id", gapMillis = 30 * 60 * 1000L,
          valueCol = "value")),

    // The BUILT-IN sessionization: Spark's session_window aggregation —
    // same inactivity-gap semantics as the custom union+window path above,
    // as one declarative groupBy (works identically under readStream,
    // where it is the streaming-native session operator). Boundary note:
    // an event at EXACTLY last_ts + gap still merges (session_window's
    // merge condition is sessionStart <= currentSessionEnd — same
    // inclusive boundary as q_sessionize), and session_end is
    // last_ts + gap, not max(ts) — the twin mirrors both.
    "q_session_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("total_value"))),

    // Robust outlier detection by median absolute deviation — the
    // heavy-tail-safe twin of q_outliers' z-score (mean and stddev are
    // themselves dragged by the outliers they're meant to find; median
    // and MAD are 50%-breakdown estimators). Two grouped exact-percentile
    // passes (state O(groups), the aggregation buffers hold values — the
    // production dial swaps in approx_percentile exactly as
    // q_winsorize_approx does) + one broadcast join back; flag at the
    // conventional |x − med| > 3·1.4826·MAD.
    "q_mad_outliers" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("med")).as("med"),
          expr("percentile(abs(value - med), 0.5)").as("mad"))
      ev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(first(col("med")), 4).as("med"),
          round(first(col("mad")), 4).as("mad"),
          count_if(abs(col("value") - col("med")) >
            lit(3.0) * lit(1.4826) * col("mad")).as("n_outliers"))
    }),

    // Event-path mining: first-order Markov transition matrix over each
    // user's time-ordered event sequence — the (from → to) counts and
    // per-from probabilities behind "what do users do after a view".
    // Per-user lag window (user-keyed partitions, the per-entity-history
    // shape that scales with users); the transition table itself is
    // |types|², so the probability normalization window is over a
    // vanishingly small aggregate, not the event stream.
    "q_event_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(seq))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      trans.withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))), 4))
    }),

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
    // Same unique (ts, event_id) struct sort; [1:8] slice == Spark's
    // slice(arr, 1, 8).
    "q_top_paths" ->
      """WITH pe AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
        |    event_type
        |  FROM events),
        |paths AS (
        |  SELECT user_id, day,
        |    array_to_string(list_transform(
        |      list_sort(array_agg(struct_pack(ts := ts,
        |        eid := event_id, et := event_type))),
        |      x -> x.et)[1:8], '>') AS path
        |  FROM pe GROUP BY 1, 2)
        |SELECT path, count(*) AS n_journeys FROM paths GROUP BY 1
        |ORDER BY n_journeys DESC, path LIMIT 20""".stripMargin,
    "q_freshness" ->
      """SELECT event_type,
        |  round((floor(epoch(TIMESTAMP '2024-01-31 00:00:00'))
        |    - floor(epoch(max(ts)))) / 3600.0, 6) AS age_hours,
        |  (floor(epoch(TIMESTAMP '2024-01-31 00:00:00'))
        |    - floor(epoch(max(ts)))) / 3600.0 <= 0.5 AS passed
        |FROM events GROUP BY event_type""".stripMargin,

    "q_ewma_control" ->
      ("""WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(floor(round(sum(value), 2) * 100 + 0.5) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |lagd AS (
        |  SELECT event_type, h, cents,
        |    coalesce(cents, 0) * 128""" +
        (1 to 7).map(i =>
          s" + coalesce(lag(cents, $i) OVER wd, 0) * ${1L << (7 - i)}")
          .mkString + """ AS num,
        |    CASE WHEN cents IS NOT NULL THEN 128 ELSE 0 END""" +
        (1 to 7).map(i => s""" + CASE WHEN lag(cents, $i) OVER wd
        |      IS NOT NULL THEN ${1L << (7 - i)} ELSE 0 END""").mkString +
        """ AS den
        |  FROM hourly
        |  WINDOW wd AS (PARTITION BY event_type ORDER BY h)),
        |sel AS (
        |  SELECT event_type, h, cents, num, den,
        |    lag(num) OVER wd2 AS num_prev, lag(den) OVER wd2 AS den_prev
        |  FROM lagd
        |  WINDOW wd2 AS (PARTITION BY event_type ORDER BY h))
        |SELECT event_type, h, cents,
        |  CASE WHEN den > 0 THEN round(num / (den * 100.0), 4) END
        |    AS ewma,
        |  coalesce(cents * den_prev > 2 * num_prev, FALSE) AS spike
        |FROM sel""").stripMargin,

    "q_cusum_changepoint" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(floor(round(sum(value), 2) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS tot,
        |    count(*) AS n
        |  FROM hourly GROUP BY 1),
        |cus AS (
        |  SELECT hh.event_type, hh.h, t.n, t.tot,
        |    CAST(row_number() OVER (PARTITION BY hh.event_type
        |      ORDER BY hh.h) AS BIGINT) AS t2,
        |    CAST(sum(cents) OVER (PARTITION BY hh.event_type ORDER BY hh.h
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM hourly hh JOIN tot t USING (event_type)),
        |r AS (
        |  SELECT *, n * cum - t2 * tot AS cusum_scaled,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * cum - t2 * tot) DESC, h ASC) AS rn
        |  FROM cus)
        |SELECT event_type, h AS change_hour,
        |  round(abs(cusum_scaled) / (n * 100.0), 2) AS max_cusum,
        |  n AS n_hours
        |FROM r WHERE rn = 1""".stripMargin,

    "q_wasserstein_drift" ->
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, cents,
        |    CAST(sum(c_ref) OVER wo AS BIGINT) AS cum_ref,
        |    CAST(sum(c_cur) OVER wo AS BIGINT) AS cum_cur,
        |    CAST(sum(c_ref) OVER wa AS BIGINT) AS n_ref,
        |    CAST(sum(c_cur) OVER wa AS BIGINT) AS n_cur,
        |    coalesce(lead(cents) OVER (PARTITION BY event_type
        |      ORDER BY cents) - cents, 0) AS gap
        |  FROM g
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY cents
        |    ROWS UNBOUNDED PRECEDING),
        |  wa AS (PARTITION BY event_type)),
        |agg AS (
        |  SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
        |    CAST(sum(abs(cum_ref * n_cur - cum_cur * n_ref) * gap)
        |      AS BIGINT) AS tsum,
        |    max(cents) - min(cents) AS range_cents
        |  FROM cum WHERE n_ref > 0 AND n_cur > 0
        |  GROUP BY 1)
        |SELECT event_type, n_ref, n_cur,
        |  round(tsum / (n_ref * n_cur * 100.0), 6) AS w1,
        |  round(tsum / (n_ref * n_cur * CAST(range_cents AS DOUBLE)), 6)
        |    AS w1_rel,
        |  CASE WHEN round(tsum / (n_ref * n_cur *
        |      CAST(range_cents AS DOUBLE)), 6) > 0.1
        |    THEN 'drifted' ELSE 'stable' END AS verdict
        |FROM agg""".stripMargin,

    "q_ks_drift" ->
      """WITH g AS (
        |  SELECT event_type, value,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type,
        |    sum(c_ref) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
        |    sum(c_cur) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cur,
        |    sum(c_ref) OVER (PARTITION BY event_type) AS n_ref,
        |    sum(c_cur) OVER (PARTITION BY event_type) AS n_cur
        |  FROM g),
        |d AS (
        |  SELECT event_type, n_ref, n_cur,
        |    round(abs(CAST(cum_ref AS DOUBLE) / n_ref
        |      - CAST(cum_cur AS DOUBLE) / n_cur), 6) AS d
        |  FROM c WHERE n_ref > 0 AND n_cur > 0),
        |a AS (
        |  SELECT event_type, CAST(max(n_ref) AS BIGINT) AS n_ref,
        |    CAST(max(n_cur) AS BIGINT) AS n_cur, max(d) AS ks
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_ref, n_cur, ks,
        |  CASE WHEN ks > 0.1 THEN 'drifted' ELSE 'stable' END AS verdict
        |FROM a""".stripMargin,

    "q_conformal_coverage" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    CASE WHEN bucket < 90 THEN 'train'
        |         WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT *,
        |    CAST(CONCAT('0x', substring(
        |      md5('split:' || CAST(event_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |      % 100 AS bucket FROM events)),
        |tr AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS tsum,
        |    count(*) AS tn
        |  FROM ev WHERE split = 'train' GROUP BY 1),
        |cal AS (SELECT e.event_type,
        |    abs(e.cents * t.tn - t.tsum) AS ss
        |  FROM ev e JOIN tr t USING (event_type) WHERE e.split = 'val'),
        |ranked AS (SELECT event_type, ss,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ss) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n_cal
        |  FROM cal),
        |qh AS (SELECT event_type, ss AS qhat_scaled, n_cal FROM ranked
        |  WHERE rn = least((9 * (n_cal + 1) + 9) // 10, n_cal))
        |SELECT q.event_type, q.n_cal,
        |  round(q.qhat_scaled / (t.tn * 100.0), 4) AS qhat,
        |  count(*) AS n_test,
        |  CAST(sum(CASE WHEN abs(e.cents * t.tn - t.tsum) <= q.qhat_scaled
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  round(CAST(sum(CASE WHEN abs(e.cents * t.tn - t.tsum)
        |      <= q.qhat_scaled THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS coverage
        |FROM ev e
        |JOIN tr t USING (event_type)
        |JOIN qh q USING (event_type)
        |WHERE e.split = 'test'
        |GROUP BY 1, 2, 3""".stripMargin,

    // Bounded-comparison oracle (the q_winsorize_approx shape): DuckDB
    // cannot see the sketch, but the split counts are exact and the
    // rank-error contract must come back true.
    "q_conformal_approx" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CASE WHEN bucket < 90 THEN 'train'
        |         WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT *,
        |    CAST(CONCAT('0x', substring(
        |      md5('split:' || CAST(event_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |      % 100 AS bucket FROM events))
        |SELECT event_type,
        |  CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cal,
        |  CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_test,
        |  CAST(1 AS BOOLEAN) AS rank_ok
        |FROM ev GROUP BY 1
        |HAVING sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) > 0
        |  AND sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) > 0
        |  AND sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) > 0"""
        .stripMargin,

    "q_psi_drift" ->
      """WITH g AS (
        |  SELECT event_type,
        |    least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |    CAST(sum(n_cur) AS BIGINT) AS t_cur, count(*) AS n_bins
        |  FROM g GROUP BY 1),
        |p AS (
        |  SELECT g.event_type, n_ref, n_cur, n_bins,
        |    (n_ref + 1.0) / (t_ref + n_bins) AS p_ref,
        |    (n_cur + 1.0) / (t_cur + n_bins) AS p_cur
        |  FROM g JOIN tot USING (event_type)),
        |a AS (
        |  SELECT event_type,
        |    round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
        |    max(n_bins) AS n_bins,
        |    CAST(sum(n_ref) AS BIGINT) AS n_events_ref,
        |    CAST(sum(n_cur) AS BIGINT) AS n_events_cur
        |  FROM p GROUP BY 1)
        |SELECT event_type, psi, n_bins, n_events_ref, n_events_cur,
        |  CASE WHEN psi < 0.1 THEN 'stable'
        |       WHEN psi < 0.25 THEN 'moderate' ELSE 'shifted' END AS verdict
        |FROM a""".stripMargin,

    "q_time_tumbling" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,

    "q_resample" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket FROM events),
        |counts AS (
        |  SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(
        |    min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
        |  FROM b GROUP BY event_type)
        |SELECT s.event_type, s.bucket, coalesce(c.n, 0) AS n
        |FROM spine s LEFT JOIN counts c
        |  ON s.event_type = c.event_type AND s.bucket = c.bucket"""
        .stripMargin,

    "q_funnel" ->
      """WITH firsts AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END)
        |      AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  count(t_view) AS stage_view,
        |  count(CASE WHEN t_click > t_view THEN 1 END) AS stage_click,
        |  count(CASE WHEN t_purchase > t_click AND t_click > t_view
        |    THEN 1 END) AS stage_purchase
        |FROM firsts""".stripMargin,

    "q_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |g AS (
        |  SELECT user_id, d,
        |    d - CAST(row_number() OVER (
        |      PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
        |  FROM days)
        |SELECT user_id, CAST(min(d) AS TIMESTAMP) AS start_day,
        |  CAST(max(d) AS TIMESTAMP) AS end_day,
        |  count(*) AS len_days
        |FROM g GROUP BY user_id, grp""".stripMargin,

    "q_retention" ->
      """WITH activity AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |  FROM events GROUP BY 1, 2),
        |cohort AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM activity
        |  GROUP BY user_id)
        |SELECT c.cohort_wk,
        |  CAST(date_diff('week', c.cohort_wk, a.wk) AS BIGINT)
        |    AS week_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM activity a JOIN cohort c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q_locf" ->
      """WITH counts AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |    count(*) AS n, round(sum(value), 2) AS total
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(
        |    min(bucket), max(bucket), INTERVAL 1 HOUR)) AS bucket
        |  FROM counts GROUP BY event_type)
        |SELECT s.event_type, s.bucket, coalesce(c.n, 0) AS n,
        |  last_value(c.total IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_total
        |FROM spine s LEFT JOIN counts c
        |  ON s.event_type = c.event_type AND s.bucket = c.bucket"""
        .stripMargin,

    "q_outliers" ->
      """WITH stats AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value,
        |  round((value - mu) / sigma, 4) AS z
        |FROM events e JOIN stats s ON e.event_type = s.event_type
        |WHERE sigma > 0 AND round(abs(value - mu) / sigma, 4) > 2"""
        .stripMargin,

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

    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, min(med) AS med,
        |    quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM events e JOIN med USING (event_type)
        |  GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  round(min(m.med), 4) AS med, round(min(m.mad), 4) AS mad,
        |  count(CASE WHEN abs(value - m.med) > 3.0 * 1.4826 * m.mad
        |    THEN 1 END) AS n_outliers
        |FROM events e JOIN mad m USING (event_type)
        |GROUP BY 1""".stripMargin,

    "q_event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |trans AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    sum(n) OVER (PARTITION BY from_type), 4) AS p
        |FROM trans""".stripMargin,

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
