package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the query surfaces — one definition each for the
  * fixture loader, the revenue aggregate, and the train/val/test hash
  * split, so a semantic change can't silently diverge between files.
  */
package object queries {

  /** Fixture table loader: `t(spark, sfDir, "lineitem")`. */
  private[queries] def t(s: SparkSession, dir: String, name: String)
      : DataFrame =
    graft.engine.Sources.table(s, dir, name)

  /** TPC-H-style revenue aggregate, rounded for oracle parity. */
  private[queries] def revenue: Column = round(
    sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)

  /** Deterministic 90/5/5 split assignment from an id hash — membership
    * depends only on the id, never on row order or partitioning. Used by
    * BOTH q_split_assign and q_decontamination so the decontamination sweep
    * always audits the split the pipeline actually uses.
    */
  /** The one md5 percent-bucket derivation (first 4 hex digits mod 100) —
    * shared by every hash-membership rule so the formula can't diverge
    * between them (their DuckDB twins mirror it as
    * `CAST(CONCAT('0x', substring(md5(key), 1, 4)) AS BIGINT) % 100`).
    */
  private[queries] def hashBucket(key: Column): Column =
    conv(substring(md5(key), 1, 4), 16, 10).cast("long") % 100

  private[queries] def splitCol(idCol: Column): Column = {
    val bucket = hashBucket(concat(lit("split:"), idCol.cast("string")))
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
  }

  /** Deterministic per-stratum downsampling: keep a row iff its id hash
    * falls under the stratum's percentage. The corpus-rebalancing op a
    * training pipeline runs (e.g. cap the dominant language) — membership
    * is a pure (stratum, id) hash, so the sample is stable under row order,
    * partitioning, AND corpus growth (a doc's fate never changes when
    * neighbors arrive). One codegen'd predicate, zero shuffle.
    */
  private[queries] def stratifiedKeep(idCol: Column, stratumCol: Column,
      pctByStratum: Map[String, Int], defaultPct: Int): Column = {
    val bucket = hashBucket(
      concat(lit("strat:"), stratumCol, lit(":"), idCol.cast("string")))
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratumCol === s, p).otherwise(acc)
    }
    bucket < pct
  }

  /** Smoothed-PSI fold shared by q_psi_drift and q_psi_journal — now ONE
    * definition with the streaming monitor too: delegates to
    * [[graft.engine.Rollup.psiReport]].
    */
  private[queries] def psiFold(binned: DataFrame, groupCol: String,
      refTotalName: String, curTotalName: String): DataFrame =
    graft.engine.Rollup.psiReport(binned, groupCol, refTotalName,
      curTotalName)

  /** DuckDB twin of [[splitCol]] as a CTE named `splits(doc_id, split)`. */
  private[queries] val splitsCte: String =
    """splits AS (
      |  SELECT doc_id,
      |    CASE WHEN bucket < 90 THEN 'train'
      |         WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT doc_id,
      |    CAST(CONCAT('0x', substring(
      |      md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
      |      % 100 AS bucket FROM documents))""".stripMargin

  /** DuckDB minhash candidate CTEs (`m`, `bands`, `cand(doc_a, doc_b)`) —
    * mirrors graft.ext.Dedup.minhashPairs (k=8, 4 bands × 2 rows,
    * Kirsch-Mitzenmacher double hashing: one md5 per shingle, h_j =
    * s1 + j·s2 over the 60/56-bit md5 halves — the SIGNATURE formula must
    * be bit-identical across engines; the band KEY may differ per engine
    * since any injective function of the slice preserves band
    * membership, so here the slice values join directly); expects a
    * shingle CTE named `sh` in scope. ONE definition for the three
    * oracles that band the same way.
    */
  private[queries] val minhashCandCte: String =
    """hs AS (
      |  SELECT doc_id,
      |    CAST(CONCAT('0x', substring(md5(shingle), 1, 15)) AS BIGINT)
      |      AS s1,
      |    CAST(CONCAT('0x', substring(md5(shingle), 17, 14)) AS BIGINT)
      |      AS s2
      |  FROM sh),
      |m AS (
      |  SELECT doc_id,
      |    min(s1 + 0 * s2) AS h0, min(s1 + 1 * s2) AS h1,
      |    min(s1 + 2 * s2) AS h2, min(s1 + 3 * s2) AS h3,
      |    min(s1 + 4 * s2) AS h4, min(s1 + 5 * s2) AS h5,
      |    min(s1 + 6 * s2) AS h6, min(s1 + 7 * s2) AS h7
      |  FROM hs GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, 0 AS band_idx, h0 AS k1, h1 AS k2 FROM m
      |  UNION ALL SELECT doc_id, 1, h2, h3 FROM m
      |  UNION ALL SELECT doc_id, 2, h4, h5 FROM m
      |  UNION ALL SELECT doc_id, 3, h6, h7 FROM m),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.k1 = b.k1 AND a.k2 = b.k2
      |    AND a.doc_id < b.doc_id)""".stripMargin
}
