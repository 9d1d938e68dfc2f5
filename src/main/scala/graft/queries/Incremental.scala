package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Pipeline, Sinks}
import graft.ext.Dedup

/** Oracle coverage for the incremental-load path (SURVEY §3 / engine
  * Pipeline.loadIncremental → readLatest): two real append batches with
  * injected timestamps land in a fresh temp table at query-build time, and
  * the registered result is [[Pipeline.readLatest]] over them — so the
  * DuckDB twin (window-dedup over the unioned batches, reconstructed from
  * the fixture) checks the WHOLE load→append→latest path, not a
  * hand-simulated version of it.
  *
  * Determinism: batch membership is a pure key predicate, timestamps are
  * injected constants, and each key appears at most once per batch, so the
  * latest-row winner is unique — no tie-break reachable.
  */
object Incremental {

  // Explicit UTC instants: Timestamp.valueOf would read the string in the
  // JVM default timezone and shift loaded_at/load_date against the oracle's
  // naive literals on any non-UTC machine.
  private val T1 =
    java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))
  private val T2 =
    java.sql.Timestamp.from(java.time.Instant.parse("2026-01-02T00:00:00Z"))

  // Built state is cached per fixture dir in [[Scratch]] (shared exit-hook
  // cleanup; sessions share builds because the content is a pure function
  // of the fixture). Bench/BenchOne call [[ensureBuilt]] OUTSIDE their
  // timers, so the timed q_incremental_* lines deterministically measure
  // only the read path in both tools.

  /** Run the two-batch incremental load recipe into a fresh scratch table
    * and return its analytics path. Day 1: 60% of keys; day 2: an
    * overlapping 50% — overlapped keys must surface with day-2 metadata,
    * day-1-only keys with day-1 metadata.
    */
  private def buildTwoBatch(s: SparkSession, dir: String, base: String)
      : String = {
    val staging = s"$base/staging"
    val analytics = s"$base/analytics"
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    Sinks.overwriteParquet(orders.filter(col("o_orderkey") % 10 < 6), staging)
    Pipeline.loadIncremental(s, staging, analytics, Some(T1))
    Sinks.overwriteParquet(
      orders.filter(col("o_orderkey") % 10 >= 3 &&
        col("o_orderkey") % 10 <= 7), staging)
    Pipeline.loadIncremental(s, staging, analytics, Some(T2))
    analytics
  }

  private def analyticsDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"history:$dir")(buildTwoBatch(s, dir, _))

  /** A separate table run through [[Pipeline.compact]] after the same two
    * loads — separate so the history-keeping table above still exercises
    * dedup-over-history while this one proves the swap protocol preserves
    * query results (same oracle as q_incremental_latest, hash-equal).
    */
  private def compactedDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"compacted:$dir") { base =>
      val analytics = buildTwoBatch(s, dir, base)
      val rep = Pipeline.compact(s, analytics, Seq("o_orderkey"))
      require(rep.ok, s"compact failed: ${rep.detail}")
      analytics
    }

  /** Journaled dedup state for q_dedup_incremental: the 80%-of-corpus
    * "history" has its LSH band table and its internal candidate pairs
    * persisted to parquet — exactly the state an incremental production
    * dedup carries between batches (O(bands) rows per doc, never the
    * bodies). Built once per fixture; the registered query then plays the
    * ARRIVAL of the remaining 20% against this journal.
    */
  private def dedupJournalDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"dedup:$dir") { base =>
      val history = t(s, dir, "documents").filter(col("doc_id") % 5 =!= 0)
      Dedup.lshBands(
          Dedup.minhashSignatures(history, "doc_id", "text"), "doc_id")
        .write.parquet(s"$base/bands")
      // Pairs from the journal READ-BACK, not the live plan: the journal is
      // the source of truth between batches, and reading it back costs one
      // tiny scan instead of a second corpus explode.
      Dedup.bandsToCandidatePairs(s.read.parquet(s"$base/bands"), "doc_id")
        .write.parquet(s"$base/pairs")
      base
    }

  /** Partial-aggregate journal for q_rollup_report: two disjoint
    * append-only slices of orders reduced to per-group partials at
    * "batch time" ([[graft.engine.Rollup.journalBatch]]). The registered
    * query reports from the JOURNAL alone; the oracle aggregates the raw
    * table directly — equality is the incremental-view-maintenance
    * contract (Σ of partial sums == direct sum, etc.).
    */
  private def rollupJournalDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"rollup:$dir") { base =>
      val orders = t(s, dir, "orders")
      val j = s"$base/journal"
      graft.engine.Rollup.journalBatch(
        orders.filter(col("o_orderkey") % 2 === 0), j,
        Seq("o_orderpriority"), "o_totalprice", "b1")
      graft.engine.Rollup.journalBatch(
        orders.filter(col("o_orderkey") % 2 === 1), j,
        Seq("o_orderpriority"), "o_totalprice", "b2")
      base
    }

  /** The same journal run through [[graft.engine.Rollup.compactJournal]] —
    * separate build so the batch-granular journal above keeps exercising
    * the multi-batch combine while this one proves compaction is invisible
    * to the report (same oracle as q_rollup_report, hash-equal — the
    * rollup twin of the [[compactedDir]] pattern).
    */
  private def rollupCompactedDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"rollup-compacted:$dir") { base =>
      val orders = t(s, dir, "orders")
      val j = s"$base/journal"
      graft.engine.Rollup.journalBatch(
        orders.filter(col("o_orderkey") % 2 === 0), j,
        Seq("o_orderpriority"), "o_totalprice", "b1")
      graft.engine.Rollup.journalBatch(
        orders.filter(col("o_orderkey") % 2 === 1), j,
        Seq("o_orderpriority"), "o_totalprice", "b2")
      val rep = graft.engine.Rollup.compactJournal(s, j)
      require(rep.ok, s"journal compaction failed: ${rep.detail}")
      base
    }

  /** The two-batch table with day 1 REPAIRED through
    * [[Pipeline.backfillDay]]: the corrected day-1 batch keeps only even
    * keys, so the oracle is the latest-view reconstruction with day 1's
    * membership predicate swapped — proving the dynamic partition
    * overwrite replaced exactly that day and left day 2 byte-identical.
    */
  private def backfilledDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"backfilled:$dir") { base =>
      val analytics = buildTwoBatch(s, dir, base)
      val corrected = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .filter(col("o_orderkey") % 10 < 6 && col("o_orderkey") % 2 === 0)
      Pipeline.backfillDay(corrected, analytics, T1)
      analytics
    }

  /** Histogram-journal quantile state for q_quantile_hist: a frozen
    * equi-depth boundary grid (persisted beside the journal — the grid
    * IS part of the state) and two batches of per-group bucket counts.
    * The registered query estimates per-group quantiles from the journal
    * alone and rank-checks them against the raw table.
    */
  private def histJournalDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"rollup-hist:$dir") { base =>
      val os = t(s, dir, "orders")
      val bounds = os.stat.approxQuantile("o_totalprice",
        (1 until 256).map(_ / 256.0).toArray, 0.001).distinct.sorted
      import s.implicits._
      bounds.toSeq.toDF("b").coalesce(1).write.parquet(s"$base/bounds")
      val j = s"$base/journal"
      graft.engine.Rollup.journalHistogram(
        os.filter(col("o_orderkey") % 2 === 0), j,
        Seq("o_orderstatus"), "o_totalprice", bounds, "b1")
      graft.engine.Rollup.journalHistogram(
        os.filter(col("o_orderkey") % 2 === 1), j,
        Seq("o_orderstatus"), "o_totalprice", bounds, "b2")
      base
    }

  /** Fixed-width histogram journal for q_psi_journal: DETERMINISTIC grid
    * (50K price steps — reproducible by the DuckDB twin, unlike the
    * equi-depth grid above whose boundaries come from approxQuantile),
    * two batches split by key parity. The drift monitor reads ONLY this
    * journal.
    */
  private[queries] val psiBounds: Array[Double] =
    (1 to 9).map(_ * 50000.0).toArray

  private def psiJournalDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"psi-hist:$dir") { base =>
      val os = t(s, dir, "orders")
      val j = s"$base/journal"
      graft.engine.Rollup.journalHistogram(
        os.filter(col("o_orderkey") % 2 === 0), j,
        Seq("o_orderstatus"), "o_totalprice", psiBounds, "b1")
      graft.engine.Rollup.journalHistogram(
        os.filter(col("o_orderkey") % 2 === 1), j,
        Seq("o_orderstatus"), "o_totalprice", psiBounds, "b2")
      base
    }

  /** Pre-build every cached table for this fixture — called by Bench and
    * BenchOne outside their timers so what q_incremental_* measures never
    * depends on suite order or warmup-fixture presence.
    */
  def ensureBuilt(s: SparkSession, dir: String): Unit = {
    // The eight builds are independent by contract (distinct scratch
    // dirs; no build reads another's output) and each is a sequence of
    // tiny latency-bound jobs (micro-batch writes), so they run as
    // CONCURRENT driver-thread jobs: while one build's small job tails
    // off, the next build's tasks backfill the freed slots (the guide's
    // overlap-independent-jobs pattern). Four in flight keeps the
    // scheduler busy without thrashing; Scratch.cached is a
    // ConcurrentHashMap computeIfAbsent, so build-once-per-key holds and
    // a racing reader of the SAME key blocks until its build lands.
    val builds: Seq[() => Unit] = Seq(
      () => { analyticsDir(s, dir); () },
      () => { compactedDir(s, dir); () },
      () => { backfilledDir(s, dir); () },
      () => { dedupJournalDir(s, dir); () },
      () => { rollupJournalDir(s, dir); () },
      () => { rollupCompactedDir(s, dir); () },
      () => { histJournalDir(s, dir); () },
      () => { psiJournalDir(s, dir); () })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs =
        builds.map(b => pool.submit(new Runnable { def run(): Unit = b() }))
      // Settle EVERY build before propagating the first failure — a
      // thrown get() mid-list would leave sibling jobs running into the
      // caller's next timed region.
      val errs = futs.flatMap { f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(e.getCause)
        }
      }
      errs.headOption.foreach(e => throw e)
    } finally pool.shutdown()
  }

  private def latestView(s: SparkSession, dir: String,
      table: (SparkSession, String) => String): DataFrame = {
    val analytics = table(s, dir)
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    // load_date → string for the compare: DuckDB DATE surfaces as a
    // timestamp in the checker's frame while Spark's stays a date, so the
    // (identical) values would mismatch on representation alone. The
    // fallback frame covers pre-sidecar all-empty tables: cleanAll on the
    // empty batch carries the exact post-load schema.
    Pipeline.readLatestOr(s, analytics, Seq("o_orderkey"),
        graft.engine.Cleaning.cleanAll(orders.limit(0), Some(T2)))
      .withColumn("load_date", col("load_date").cast("string"))
  }

  /** Daily-consumer read: ONE `load_date` partition of the incremental
    * table. This is the scan shape the partitioned layout exists for — at
    * 100 TB the filter must prune to the day's directory at plan time
    * (FileScan PartitionFilters, pinned by PlanSpec), never read-then-drop
    * history. Aggregates are exact-typed (counts, integer min/max) so the
    * compare is merge-order-independent.
    */
  private def day2Summary(s: SparkSession, dir: String): DataFrame =
    Pipeline.readTable(s, analyticsDir(s, dir))
      .filter(col("load_date") === lit("2026-01-02").cast("date"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_incremental_latest" -> ((s, dir) => latestView(s, dir, analyticsDir)),
    "q_incremental_compacted" -> ((s, dir) => latestView(s, dir, compactedDir)),
    "q_incremental_backfilled" -> ((s, dir) => latestView(s, dir, backfilledDir)),
    "q_incremental_prune" -> ((s, dir) => day2Summary(s, dir)),

    // Incremental dedup-state maintenance: the new 20% batch arrives, its
    // signatures/bands are computed (O(batch)), and ONLY pairs involving a
    // new doc are generated — a band join of new against journal ∪ new,
    // never a full-corpus recompute. Journaled pairs ∪ incremental pairs
    // must equal the FULL-corpus candidate set (the oracle is the
    // q_dedup_minhash_pairs twin verbatim), which is what licenses the
    // incremental path in production: batch-by-batch dedup converges to
    // exactly the from-scratch answer.
    "q_dedup_incremental" -> ((s, dir) => {
      val root = dedupJournalDir(s, dir)
      val newDocs = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
      // Checkpoint the new batch's signatures: they feed three join sides
      // (new-old plus both halves of new-new) and exchange reuse across
      // self-join aliases is unreliable (see Dedup.minhashPairs).
      val newSig = Dedup.minhashSignatures(newDocs, "doc_id", "text")
        .localCheckpoint()
      val newBands = Dedup.lshBands(newSig, "doc_id")
      // old-old pairs are journaled; incremental pairs all involve a new
      // doc, so the union is disjoint — no final dedup needed.
      s.read.parquet(s"$root/pairs").unionAll(
        Dedup.incrementalCandidatePairs(
          s.read.parquet(s"$root/bands"), newBands, "doc_id"))
    }),

    // Incremental view maintenance of an algebraic aggregate: the report
    // reads ONLY the journaled per-batch partials (O(groups × batches)
    // rows); the oracle aggregates the raw table. Equality is the IVM
    // contract — and the reason a daily 100 TB report costs O(increment).
    // avg divides by n_val (non-null measure count), matching SQL AVG —
    // dividing by the row count would deflate the mean under NULLs.
    "q_rollup_report" -> ((s, dir) =>
      rollupSelect(graft.engine.Rollup.report(s,
        s"${rollupJournalDir(s, dir)}/journal", Seq("o_orderpriority")))),

    // Identical report over the COMPACTED journal: compaction must be
    // invisible to readers, so this row shares q_rollup_report's oracle —
    // a hash mismatch means the fold lost or double-counted a partial.
    "q_rollup_report_compacted" -> ((s, dir) =>
      rollupSelect(graft.engine.Rollup.report(s,
        s"${rollupCompactedDir(s, dir)}/journal", Seq("o_orderpriority")))),

    // Mergeable quantile state: per-group p50/p95 estimated from the
    // histogram journal alone (raw rows never rescanned for the
    // estimate), then RANK-CHECKED against the raw table — the fraction
    // of rows at or below each estimate must sit within ±5% of the
    // target rank (grid error is ~1/256). Bounded-comparison oracle:
    // DuckDB predicts the count and the booleans.
    "q_quantile_hist" -> ((s, dir) => {
      val base = histJournalDir(s, dir)
      val bounds = s.read.parquet(s"$base/bounds")
        .collect().map(_.getDouble(0)).sorted
      val est = graft.engine.Rollup.quantileEstimate(s, s"$base/journal",
        Seq("o_orderstatus"), bounds, Seq(0.5, 0.95))
      t(s, dir, "orders").join(broadcast(est), "o_orderstatus")
        .groupBy(col("o_orderstatus"), col("p"))
        .agg(count(lit(1)).as("n"),
          count_if(col("o_totalprice") <= col("est")).as("le"))
        .select(col("o_orderstatus"), col("p"), col("n"),
          (col("le") / col("n"))
            .between(col("p") - 0.05, col("p") + 0.05).as("rank_ok"))
    }),

    // Standing drift monitor from the IVM journal: PSI of the price
    // distribution per order status, batch b1 (reference) vs b2
    // (current), computed from the histogram journal ALONE — the raw
    // table is never rescanned to answer "did the distribution move?".
    // Same smoothed-PSI fold as q_psi_drift (add-one over the observed
    // bin union); the replay-dedup guard mirrors quantileEstimate's.
    // The oracle recomputes from raw orders with the identical
    // fixed-grid bucket function, so a green row proves the journal is a
    // lossless sufficient statistic for drift.
    "q_psi_journal" -> ((s, dir) =>
      graft.engine.Rollup.psiFromJournal(s,
        s"${psiJournalDir(s, dir)}/journal", "o_orderstatus", "b1", "b2",
        "n_rows_ref", "n_rows_cur")))

  private def rollupSelect(report: DataFrame): DataFrame =
    report.select(col("o_orderpriority"), col("n"),
      round(col("total"), 2).as("total"),
      round(col("total") / col("n_val"), 4).as("avg_price"),
      col("min_v"), col("max_v"))

  /** The twin reconstructs both cleaned batches from the fixture and
    * window-dedups by key on the injected load timestamp. Cleaning mirror:
    * numeric zero-fill + fill-'Unknown'→lower→trim on the one string column
    * (dedupExact and date coercion are no-ops on this projection).
    */
  // One SQL text for both the history-keeping and the compacted table:
  // compaction must be invisible to readers, so the compacted query's twin
  // IS the latest-view twin — a hash mismatch there means the swap lost or
  // duplicated rows.
  private val latestSql =
    """WITH c AS (
        |  SELECT o_orderkey, coalesce(o_custkey, 0) AS o_custkey,
        |    coalesce(o_totalprice, 0.0) AS o_totalprice,
        |    trim(lower(coalesce(o_orderstatus, 'Unknown'))) AS o_orderstatus
        |  FROM orders),
        |u AS (
        |  SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS loaded_at,
        |    '2026-01-01' AS load_date
        |  FROM c WHERE o_orderkey % 10 < 6
        |  UNION ALL
        |  SELECT *, TIMESTAMP '2026-01-02 00:00:00', '2026-01-02'
        |  FROM c WHERE o_orderkey % 10 BETWEEN 3 AND 7),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_orderkey ORDER BY loaded_at DESC) AS rn
        |  FROM u)
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
        |  loaded_at, load_date
        |FROM r WHERE rn = 1""".stripMargin

  // Declared BEFORE the map that references it: a same-object val used
  // ahead of its declaration initializes to null (Scala template forward
  // reference), which would silently null both rollup oracle entries.
  private val rollupReportSql =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  round(avg(o_totalprice), 4) AS avg_price,
      |  min(o_totalprice) AS min_v, max(o_totalprice) AS max_v
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** The backfilled twin: identical reconstruction, but day 1's batch is
    * the CORRECTED membership (even keys only) — if the partition
    * overwrite had leaked old day-1 rows or touched day 2, the hash
    * would diverge.
    */
  private val backfilledSql =
    """WITH c AS (
        |  SELECT o_orderkey, coalesce(o_custkey, 0) AS o_custkey,
        |    coalesce(o_totalprice, 0.0) AS o_totalprice,
        |    trim(lower(coalesce(o_orderstatus, 'Unknown'))) AS o_orderstatus
        |  FROM orders),
        |u AS (
        |  SELECT *, TIMESTAMP '2026-01-01 00:00:00' AS loaded_at,
        |    '2026-01-01' AS load_date
        |  FROM c WHERE o_orderkey % 10 < 6 AND o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT *, TIMESTAMP '2026-01-02 00:00:00', '2026-01-02'
        |  FROM c WHERE o_orderkey % 10 BETWEEN 3 AND 7),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_orderkey ORDER BY loaded_at DESC) AS rn
        |  FROM u)
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
        |  loaded_at, load_date
        |FROM r WHERE rn = 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_incremental_latest" -> latestSql,
    "q_incremental_compacted" -> latestSql,
    "q_incremental_backfilled" -> backfilledSql,

    // The twin is the FULL-corpus candidate computation — no batches, no
    // journal. Matching it proves the incremental decomposition is exact.
    "q_dedup_incremental" ->
      s"""WITH ${Docs.shingleCte},
        |$minhashCandCte
        |SELECT doc_a, doc_b FROM cand""".stripMargin,

    // The day-2 partition holds exactly the cleaned day-2 batch (appends
    // never rewrite other partitions), so the twin is the batch predicate
    // re-applied to the fixture.
    "q_incremental_prune" ->
      """WITH c AS (
        |  SELECT o_orderkey,
        |    trim(lower(coalesce(o_orderstatus, 'Unknown'))) AS o_orderstatus
        |  FROM orders)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM c WHERE o_orderkey % 10 BETWEEN 3 AND 7
        |GROUP BY 1""".stripMargin,

    // Direct aggregation over the raw table — no journal, no batches.
    // Matching it proves the partial decomposition is exact. ONE SQL text
    // for both the batch-granular and the compacted journal: compaction
    // must be invisible to the report, so the compacted query's twin IS
    // the report twin.
    "q_rollup_report" -> rollupReportSql,
    "q_rollup_report_compacted" -> rollupReportSql,

    // The count is exact per (status, p); the rank-error contract comes
    // back as constants the estimate must satisfy.
    "q_quantile_hist" ->
      """SELECT o_orderstatus, p, count(*) AS n,
        |  CAST(1 AS BOOLEAN) AS rank_ok
        |FROM orders CROSS JOIN (VALUES (0.5), (0.95)) v(p)
        |GROUP BY 1, 2""".stripMargin,

    // Recomputes q_psi_journal from RAW orders with the identical
    // fixed-grid bucket rule (bucket = #boundaries <= value, matching
    // QuantileBucket's binarySearch contract) and key-parity batch split
    // — equality proves the journal is a lossless drift statistic.
    "q_psi_journal" ->
      """WITH b AS (
        |  SELECT o_orderstatus,
        |    CAST(len(list_filter(
        |      [50000.0, 100000.0, 150000.0, 200000.0, 250000.0,
        |       300000.0, 350000.0, 400000.0, 450000.0],
        |      x -> x <= o_totalprice)) AS BIGINT) AS h_bucket,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'b1' ELSE 'b2' END AS batch
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |g AS (
        |  SELECT o_orderstatus, h_bucket,
        |    CAST(sum(CASE WHEN batch = 'b1' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ref,
        |    CAST(sum(CASE WHEN batch = 'b2' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cur
        |  FROM b GROUP BY 1, 2),
        |tot AS (
        |  SELECT o_orderstatus, CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |    CAST(sum(n_cur) AS BIGINT) AS t_cur, count(*) AS n_bins
        |  FROM g GROUP BY 1),
        |p AS (
        |  SELECT g.o_orderstatus, n_ref, n_cur, n_bins,
        |    (n_ref + 1.0) / (t_ref + n_bins) AS p_ref,
        |    (n_cur + 1.0) / (t_cur + n_bins) AS p_cur
        |  FROM g JOIN tot USING (o_orderstatus))
        |SELECT o_orderstatus,
        |  round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi,
        |  max(n_bins) AS n_bins,
        |  CAST(sum(n_ref) AS BIGINT) AS n_rows_ref,
        |  CAST(sum(n_cur) AS BIGINT) AS n_rows_cur
        |FROM p GROUP BY 1""".stripMargin)
}
