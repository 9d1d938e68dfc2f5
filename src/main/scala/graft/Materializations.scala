package graft

import org.apache.spark.sql.SparkSession

/** The engine's "pay the shuffle once at ingest" levers as a NAMED,
  * priceable registry. Each entry builds one materialized layout that
  * consumer queries then read in steady state:
  *
  *   - `m_bucketed_tables`     — orders/customer written bucketed+sorted
  *     on custkey (`queries.Joins.ensureBucketed`): the zero-exchange
  *     layout `q_join_bucketed` reads.
  *   - `m_incremental_history` — the analytics/journal/compaction tables
  *     (`queries.Incremental.ensureBuilt`) behind the q_incremental_*
  *     and journal-fold families.
  *   - `m_triangle_state`      — the wedge-join triangle/support tables
  *     (`ext.Graph.writeTriangleState`, the suite's largest shuffle)
  *     behind `q_triangles_state`/`q_clustering_coeff`/`q_ktruss`.
  *   - `m_dedup_state`         — the minhash→verify→cluster near-dup
  *     state (`engine.Pipeline.writeDedupState`) behind
  *     `q_dedup_state_kept`.
  *   - `m_dedup_state_incr`    — half-corpus build + incremental fold
  *     (`engine.Pipeline.updateDedupState`) behind `q_dedup_state_incr`.
  *
  * Why a registry: the amortization claim ("the wedge enumeration runs
  * exactly once per corpus version") is only honest if the one-time cost
  * is a measured, committed ledger line. Before this existed the gate
  * bench billed each build to whichever consumer ran first alphabetically
  * (r14: `q_clustering_coeff` read 34.8 s against a ~0.45 s steady-state
  * plan) and the scale ledgers' untimed pre-pass excluded it from every
  * row — real work, priced nowhere. Bench and ScaleSuite now run these
  * FIRST, timed, and emit a `materializations` section (wall + shuffle
  * bytes, and growth factors across fixtures in the scale ledgers).
  *
  * Builds go through the SAME Scratch-cached entry points the consumer
  * queries call, so pricing the build here simultaneously warms the cache
  * the consumers read — the consumer rows then measure steady-state reads
  * by construction, not by suite-order luck.
  */
object Materializations {

  /** Build order is alphabetical and entries are independent — no build
    * reads another's output.
    */
  val builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "m_bucketed_tables" ->
      ((s, d) => { queries.Joins.ensureBucketed(s, d); () }),
    "m_dedup_state" ->
      ((s, d) => { queries.Docs.dedupStateDir(s, d); () }),
    "m_dedup_state_incr" ->
      ((s, d) => { queries.Docs.dedupStateIncrDir(s, d); () }),
    "m_incremental_history" ->
      ((s, d) => queries.Incremental.ensureBuilt(s, d)),
    "m_triangle_state" ->
      ((s, d) => { queries.Joins.triStateDir(s, d); () }),
  )
}
