package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of algebraic aggregates: per-batch PARTIALS
  * (sum/counts/min/max per group) journaled to parquet, combined into the
  * current report by re-aggregating the journal — sum of sums, sum of
  * counts, min of mins, max of maxs, avg = Σsum/Σ(non-null count).
  *
  * The 100 TB point: a daily report over an append-only fact should not
  * rescan history. Each batch contributes O(groups) journal rows once, at
  * batch time; the report then reads O(groups × batches) partial rows —
  * independent of raw row count — and [[compactJournal]] periodically
  * folds the partials back to O(groups), bounding both the report cost
  * and the journal's file count. This is the exact-arithmetic sibling of
  * [[graft.functions.Sketches]] (same shard-then-merge shape, exact
  * instead of approximate, limited to decomposable aggregates — a median
  * or COUNT(DISTINCT) does NOT journal this way; use the sketch).
  *
  * Two counts are journaled per group: `p_rows` (all rows, COUNT(*)) and
  * `p_cnt` (non-null values of the measure, COUNT(col)). SQL's AVG skips
  * NULLs, so a derived average must divide by the NON-NULL count —
  * dividing Σsum by Σrows silently deflates the mean the moment the
  * measure column has a null.
  *
  * DELETES: sum and the counts form an abelian group — a retraction
  * partial with negated values maintains them exactly. min/max do NOT
  * (deleting the current minimum says nothing about the next-smallest
  * without a rescan), so under deletes the journal's min_v/max_v are
  * conservative BOUNDS of the true extrema, not the extrema — RollupSpec
  * demonstrates the stale bound. If exact extrema under deletion matter,
  * recompute them from the base table (or keep a per-group heap outside
  * this module); do not trust a delete-bearing journal's min/max.
  *
  * Batch idempotence is the caller's contract (same seam as streaming
  * ingestion): re-journaling a batch appends duplicate partial rows.
  * [[report]] and [[compactJournal]] both collapse exact duplicates by
  * (group, batch tag) — the partials for a replayed batch are recomputed
  * from the same input and land identical, so the crash-between-journal-
  * and-marker seam of [[graft.streaming.Streams.journalBatchIdempotent]]
  * self-heals at read time instead of silently inflating totals.
  *
  * Reference tie-in: the validator recomputes COUNT/aggregate gates over
  * the WHOLE analytics table daily (`/root/reference/data_validator.py:64`)
  * — this is that recomputation made O(increment).
  */
object Rollup {

  private val PartialCols =
    Set("p_sum", "p_cnt", "p_rows", "p_min", "p_max", "batch")

  /** Reduce one batch to its per-group partials and append them to the
    * journal. One partial+final hash-agg over the batch, one tiny write.
    */
  def journalBatch(batch: DataFrame, journalDir: String,
      groupCols: Seq[String], valueCol: String, batchTag: String): Unit =
    batch.groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol)).as("p_sum"),
        count(col(valueCol)).as("p_cnt"),
        count(lit(1)).as("p_rows"),
        min(col(valueCol)).as("p_min"), max(col(valueCol)).as("p_max"))
      .withColumn("batch", lit(batchTag))
      .write.mode("append").parquet(journalDir)

  /** A replayed batch re-journals byte-identical partial rows (same tag,
    * same deterministic aggregation of the same input); collapsing on
    * (group, batch) makes the at-least-once append seam harmless. A
    * same-tag duplicate with DIFFERENT partial values would mean two
    * different datasets were journaled under one tag — a caller bug this
    * cannot repair (one of the two is kept, arbitrarily).
    */
  private def dedupReplays(journal: DataFrame, groupCols: Seq[String])
      : DataFrame = journal.dropDuplicates(groupCols :+ "batch")

  /** Current report from the journal alone: raw data is never touched.
    * Columns: group cols + total / n (rows) / n_val (non-null values) /
    * min_v / max_v. AVG(valueCol) = total / n_val.
    */
  def report(spark: SparkSession, journalDir: String,
      groupCols: Seq[String]): DataFrame =
    dedupReplays(spark.read.parquet(journalDir), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("p_sum")).as("total"), sum(col("p_rows")).as("n"),
        sum(col("p_cnt")).as("n_val"),
        min(col("p_min")).as("min_v"), max(col("p_max")).as("max_v"))

  /** Fold the whole journal into ONE partial row per group (tagged
    * `_compacted`), atomically replacing the journal directory — the
    * growth bound for a journal that appends one file-set per batch
    * forever: after compaction the report reads O(groups) rows and the
    * directory holds one file-set until batches accumulate again.
    *
    * Swap protocol mirrors [[Pipeline.compact]]: write `<dir>.compact-tmp`,
    * move live aside, move tmp into place, drop old — no point in the
    * sequence has the journal been deleted before its replacement is
    * complete. The streaming commit ledger (`_graft_commits/` markers from
    * [[graft.streaming.Streams.startRollupJournal]]) is carried through
    * verbatim: a replayed batchId after compaction must still be a no-op,
    * and the markers are exactly that claim.
    *
    * Single-writer contract: a journalBatch racing the swap can land its
    * append in the about-to-be-dropped live dir and be lost — compaction
    * belongs in the same maintenance window as the journal writer's
    * quiesce, the same discipline [[Pipeline.compact]] requires.
    */
  def compactJournal(spark: SparkSession, journalDir: String)
      : Pipeline.StageReport = {
    import org.apache.hadoop.fs.Path
    val pLive = new Path(journalDir)
    val pTmp = new Path(journalDir + ".compact-tmp")
    val pOld = new Path(journalDir + ".compact-old")
    val fsEntry = pLive.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Pipeline.recoverStrandedSwap(fsEntry, pLive, pOld) match {
      case Some(err) =>
        return Pipeline.StageReport("compact_journal", ok = false, err)
      case None => ()
    }
    val journal = spark.read.parquet(journalDir)
    val groupCols = journal.columns.filterNot(PartialCols.contains).toSeq
    dedupReplays(journal, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("p_sum")).as("p_sum"), sum(col("p_cnt")).as("p_cnt"),
        sum(col("p_rows")).as("p_rows"),
        min(col("p_min")).as("p_min"), max(col("p_max")).as("p_max"))
      .withColumn("batch", lit("_compacted"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(pTmp.toString)
    val fs = pLive.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledgerLive = new Path(pLive, "_graft_commits")
    if (fs.exists(ledgerLive)) {
      val ledgerTmp = new Path(pTmp, "_graft_commits")
      fs.mkdirs(ledgerTmp)
      fs.listStatus(ledgerLive).filter(_.isFile).foreach { st =>
        val in = fs.open(st.getPath)
        val body = try in.readAllBytes() finally in.close()
        val out = fs.create(new Path(ledgerTmp, st.getPath.getName), true)
        try out.write(body) finally out.close()
      }
    }
    fs.delete(pOld, true)
    if (!fs.rename(pLive, pOld))
      return Pipeline.StageReport("compact_journal", ok = false,
        "could not stage current journal aside; journal untouched")
    if (!fs.rename(pTmp, pLive)) {
      val restored = fs.rename(pOld, pLive)
      return Pipeline.StageReport("compact_journal", ok = false,
        if (restored) "swap failed; original restored"
        else s"swap failed AND restore failed — journal stranded at $pOld")
    }
    fs.delete(pOld, true)
    Pipeline.StageReport("compact_journal", ok = true,
      s"compacted $journalDir")
  }
}
