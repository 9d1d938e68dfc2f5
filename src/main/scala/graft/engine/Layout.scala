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
  * Keys are first rank-compressed to dense ordinals, because Z-values
  * interleave RANKS usefully only when both dimensions occupy their bit
  * range densely; raw skewed values waste interleave bits. The
  * compression is approx-quantile boundaries + a codegen'd binary-search
  * bucket ([[graft.functions.QuantileBucket]]) — NOT a global-window
  * ntile, which would funnel the whole table through one task per key at
  * write time. approxQuantile is a distributed sketch merge (one pass
  * over both keys together), the boundary arrays ride in the plan like a
  * broadcast literal, and the bucket lookup is row-local — the write
  * plan has no Window and no single-partition exchange (pinned by
  * LayoutSpec).
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

  /** Z-order `df` across keys (keyA, keyB) — numeric or string — into
    * `files` output files: each key is rank-compressed to a dense ordinal
    * by bucketing
    * against `buckets-1` approx-quantile boundaries (computed for both
    * keys in ONE distributed sketch pass, relative error well under a
    * bucket width), Morton-interleaved, and the frame is range-clustered
    * on the code.
    *
    * Exact ranks are not required — bucket-uniform occupancy is, and the
    * quantile boundaries give it by construction even under heavy skew
    * (each bucket holds ~1/buckets of the rows). 2^12 buckets per key
    * yield 2^24 z-cells, orders of magnitude finer than any realistic
    * output file count, so pruning granularity is file-bound, not
    * ordinal-bound. At 100 TB nothing here degenerates: the sketch agg
    * is map-side mergeable, the boundary arrays are a few KB shipped
    * with the plan, the bucket lookup is codegen'd and row-local, and
    * the only shuffle is the range repartition the clustering needs
    * anyway.
    */
  def zOrderBy(df: DataFrame, keyA: String, keyB: String,
      files: Int, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536] (16-bit Morton lanes), got $buckets")
    // STRING keys ride the same numeric quantile machinery via an
    // order-preserving 7-byte UTF-8 prefix pack (UTF-8 byte order ==
    // code-point order; 7 bytes stays non-negative). Clustering only
    // needs order, and prefix ties simply share a bucket. The packed
    // column is temporary — quantiles and bucketing both read it, so the
    // double-rounding of >2^53 longs is applied identically on both
    // sides (monotone, bucket-consistent).
    val (packed, pkA, pkB) = {
      import org.apache.spark.sql.types._
      var d = df
      def pack(key: String, tmp: String): String = d.schema(key).dataType match {
        case StringType =>
          d = d.withColumn(tmp,
            graft.functions.BucketExprs.stringPrefixLong(col(key)))
          tmp
        // timestamps/dates are the most common clustering dimension but
        // not NumericType for approxQuantile — epoch cast is exact and
        // order-preserving
        case TimestampType =>
          d = d.withColumn(tmp, unix_micros(col(key))); tmp
        case TimestampNTZType => // NTZ→TZ cast in session TZ is monotone
          d = d.withColumn(tmp,
            unix_micros(col(key).cast(TimestampType))); tmp
        case DateType =>
          d = d.withColumn(tmp, datediff(col(key), lit("1970-01-01"))); tmp
        case _ => key
      }
      val a = pack(keyA, "__zpa")
      val b = pack(keyB, "__zpb")
      (d, a, b)
    }
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // Error budget: half a bucket width. Bucket occupancy stays within
    // ~±50% of uniform, which is all the interleave needs.
    val bounds = packed.stat.approxQuantile(Array(pkA, pkB), probs,
      0.5 / buckets)
    // distinct: under skew (or a low-cardinality key), adjacent quantiles
    // collapse to one value; duplicate boundaries would make
    // boundary-equal rows land in a nondeterministic bucket. The
    // surviving bucket index is then rescaled to a dense 16-bit lane —
    // WITHOUT this, a low-cardinality key occupies fewer ordinal bits
    // than a continuous one and the interleave silently weights the
    // denser dimension (measured: custkey pruning degrades ~15% at
    // sf0.01 when left unscaled).
    def ordinal(key: String, b: Array[Double]) = {
      val cuts = b.distinct.sorted
      val scale = lit(65535L / math.max(cuts.length.toLong, 1L))
      coalesce(
        graft.functions.BucketExprs.quantileBucket(col(key), cuts) * scale,
        lit(0L))
    }
    packed.withColumn("__za", ordinal(pkA, bounds(0)))
      .withColumn("__zb", ordinal(pkB, bounds(1)))
      .withColumn("__z", zValue(col("__za"), col("__zb")))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__zpa", "__zpb", "__za", "__zb", "__z")
  }
}
