package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time layout for data skipping (SURVEY §2 extension; LayoutSpec
  * measures the effect).
  *
  * Single-key clustering is `repartitionByRange + sortWithinPartitions` on
  * the access key. For TWO access dimensions that trick helps only the
  * leading key — the trailing key's values smear across every file. The
  * classic fix is Z-ORDERING: interleave the bits of both keys into one
  * Morton code and range-cluster on THAT, so files cover compact rectangles
  * of (a, b) space and parquet's row-group min/max stats prune scans
  * filtered on EITHER dimension.
  *
  * The bit-spread uses the standard mask-shift (Morton) construction —
  * pure built-in column ops (shiftleft/and/or), fully codegen'd, no UDF.
  * Keys are first rank-compressed to 16-bit ordinals via ntile, because
  * Z-values interleave RANKS usefully only when both dimensions occupy
  * their bit range densely; raw skewed values waste interleave bits.
  */
object Layout {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i —
    * Morton construction step (x | x<<8) & masks, 4 rounds.
    */
  private[engine] def spread16(x: Column): Column = {
    val s1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two 16-bit ordinals: a's bits on even positions, b's
    * on odd.
    */
  private[engine] def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Z-order `df` across (keyA, keyB) into `files` output files: each key
    * is rank-compressed to a 16-bit ordinal (ntile over 65536 buckets —
    * one pass per key, exact rank not required), Morton-interleaved, and
    * the frame is range-clustered on the code. At 100 TB the ntile ranks
    * come from approx quantile boundaries instead of a global sort; the
    * interleave and clustering are unchanged.
    */
  def zOrderBy(df: DataFrame, keyA: String, keyB: String,
      files: Int): DataFrame = {
    val wA = org.apache.spark.sql.expressions.Window.orderBy(col(keyA))
    val wB = org.apache.spark.sql.expressions.Window.orderBy(col(keyB))
    df.withColumn("__za", (ntile(65536).over(wA) - 1).cast("long"))
      .withColumn("__zb", (ntile(65536).over(wB) - 1).cast("long"))
      .withColumn("__z", zValue(col("__za"), col("__zb")))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__za", "__zb", "__z")
  }
}
