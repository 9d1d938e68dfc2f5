package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins on hot keys.
  *
  * A hash shuffle sends every row of a key to one partition; a key holding
  * 1% of 100 TB serializes a terabyte through a single task. AQE's skew-join
  * split handles sort-merge cases at runtime; this helper is the explicit
  * form for when the skew is known (e.g. the null-ish "unknown" key after
  * cleaning, or a head-heavy web domain in a crawl): spread the big side's
  * hot rows over `factor` sub-keys and replicate the small side `factor`×.
  *
  * The salt is DETERMINISTIC — `pmod(hash(every left column), factor)` —
  * so retried tasks re-derive the same assignment (a `rand()` salt breaks
  * exactly-once semantics under task retry).
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `key`, with `left` salted `factor`
    * ways and `right` replicated per salt. Produces the same rows as the
    * plain join; the shuffle spreads each hot key over `factor` partitions.
    */
  /** The salt assignment saltedJoin applies to the big side: a
    * deterministic row-level hash over EVERY column — a key-only hash would
    * send all rows of a hot key to one salt bucket and defeat the whole
    * mitigation. Exposed so tests exercise the real derivation.
    */
  def saltColumn(df: DataFrame, factor: Int): org.apache.spark.sql.Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(factor))

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val l = left.withColumn("__salt", saltColumn(left, factor))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, l("__salt") === r("__salt") && l(key) === r(key))
      .drop(l("__salt")).drop(r("__salt")).drop(r(key))
  }

  /** [[saltedJoin]] with the hot keys MEASURED instead of assumed: one
    * aggregate over the big side finds keys holding more than
    * `hotThreshold` rows (the aggregate is itself skew-immune — partial
    * per-partition counts combine map-side, so a hot key costs a long
    * per partition, never a wide shuffle), the ≤#distinct-hot-keys set
    * broadcasts back, and ONLY hot rows are salted: the small side
    * replicates `factor`× for the hot keys alone, so mitigation cost is
    * proportional to the skew actually present, not the whole table —
    * the difference between "salt everything `factor`×" and a no-op on a
    * uniform day. Cold rows join on salt 0 against the unreplicated
    * branch; produces exactly the plain join's rows (row-parity pinned
    * in SkewSpec and by the oracle twin).
    */
  def adaptiveSaltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int, hotThreshold: Long): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    require(hotThreshold > 0,
      s"hot threshold must be positive, got $hotThreshold")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key).as("__hotkey"), lit(true).as("__hot"))
    val l = left
      .join(broadcast(hot), left(key) === col("__hotkey"), "left")
      .withColumn("__salt",
        when(col("__hot"), saltColumn(left, factor)).otherwise(lit(0)))
      .drop("__hotkey", "__hot")
    val r = right
      .join(broadcast(hot), right(key) === col("__hotkey"), "left")
      .withColumn("__salt", explode(
        when(col("__hot"), array((0 until factor).map(lit): _*))
          .otherwise(array(lit(0)))))
      .drop("__hotkey", "__hot")
    l.join(r, l("__salt") === r("__salt") && l(key) === r(key))
      .drop(l("__salt")).drop(r("__salt")).drop(r(key))
  }
}
