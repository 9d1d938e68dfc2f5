package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-domain surfaces; each key has a DuckDB
  * oracle twin in `oracleSql` (column names aliased identically on both
  * sides — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  private def registry: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (Parity.queries, Parity.oracles),
    (Joins.queries, Joins.oracles),
    (Windows.queries, Windows.oracles),
    (Events.queries, Events.oracles),
    (Docs.queries, Docs.oracles),
    (Vectors.queries, Vectors.oracles),
    (Analytics.queries, Analytics.oracles),
    (Incremental.queries, Incremental.oracles),
    (Changes.queries, Changes.oracles),
    (Connector.queries, Connector.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed curation pipeline (quality → dedup → decontamination →
    * mixture) — the engine's whole north-star story in one plan; 98 rows /
    * 341 kept docs at sf0.001, so the rows>0 smoke check has wide margin.
    */
  def entry(spark: SparkSession): DataFrame =
    Docs.queries("q_curation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. A cross-file key
    * collision would make `Map ++` silently drop the earlier query (and its
    * oracle in lockstep, so nothing would fail loudly) — guard at startup.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = registry.map(_._1).reduce(_ ++ _)
    require(merged.size == registry.map(_._1.size).sum,
      "duplicate query key across surface files")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. A null
    * VALUE fails loudly here: a same-object val referenced ahead of its
    * declaration initializes to null (Scala template forward reference),
    * and a null SQL string would crash the oracle-json writer AFTER the
    * dump, leaving a stale oracle file that silently passes.
    */
  def oracleSql: Map[String, String] = {
    val merged = registry.map(_._2).reduce(_ ++ _)
    val nulls = merged.collect { case (k, v) if v == null => k }
    require(nulls.isEmpty,
      s"null oracle SQL (forward-reference init?): ${nulls.mkString(",")}")
    merged
  }
}
