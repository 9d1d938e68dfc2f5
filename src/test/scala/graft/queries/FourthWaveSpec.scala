package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-case semantics pins for the r14 wave — the corners the fixture
  * oracle can't isolate: skyline dominance under exact ties, the shared
  * KS/W1 folds on hand-computed distributions, and the bit-level
  * sign-signature packing.
  */
class FourthWaveSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("q_skyline: exact-tie corners match the quadratic dominance " +
      "definition on an adversarial fixture") {
    import spark.implicits._
    // Duplicate (price, size) points (don't dominate each other), a
    // same-price-larger-size pair (dominates), a same-size-cheaper pair
    // (dominates), an interior dominated point, and a bucket-boundary
    // straddle (99.99 vs 100.01 land in different price buckets).
    val parts = Seq(
      (1L, 40.0, 45), (2L, 40.0, 45), // duplicate front point ×2
      (3L, 100.0, 60), // undominated: bigger than everything cheaper
      (4L, 200.0, 60), // same size as 3, dearer: dominated by 3
      (5L, 150.0, 55), // dominated by 3 (cheaper AND bigger exists)
      (6L, 99.99, 10), (7L, 100.01, 70), // bucket-boundary straddle
      (8L, 50.0, 5), // dominated by the duplicates (dearer, smaller)
    ).toDF("p_partkey", "p_retailprice", "p_size")
    val dir = java.nio.file.Files.createTempDirectory("sky").toString
    parts.write.parquet(s"$dir/part.parquet")
    val got = graft.SparkEntry.queries("q_skyline")(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
    // Brute-force dominance over distinct points, independently coded.
    val pts = Seq((40.0, 45L), (100.0, 60L), (200.0, 60L), (150.0, 55L),
      (99.99, 10L), (100.01, 70L), (50.0, 5L)).distinct
    val want = pts.filterNot { case (p, s) =>
      pts.exists { case (p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.toSet
    assert(got === want)
    // the duplicate point survives with its multiplicity and min key
    val dup = graft.SparkEntry.queries("q_skyline")(spark, dir)
      .filter(col("price") === 40.0 && col("psize") === 45)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(dup.toSeq === Seq((2L, 1L)), "n_parts=2, first_partkey=1")
  }

  test("Rollup.ksReport: hand-computed sup-norm gap; one-sided groups " +
      "are dropped, not divided by zero") {
    import spark.implicits._
    val counts = Seq(
      ("a", 1.0, 1L, 0L), ("a", 2.0, 1L, 1L), ("a", 3.0, 0L, 1L),
      ("b", 1.0, 3L, 0L), // cur side empty: KS undefined -> dropped
    ).toDF("g", "value", "c_ref", "c_cur")
    val got = graft.engine.Rollup.ksReport(counts, "g", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    // F_ref = (.5, 1, 1), F_cur = (0, .5, 1) -> sup gap 0.5
    assert(got.toSeq === Seq(("a", 2L, 2L, 0.5, "drifted")))
  }

  test("Rollup.w1Report: hand-computed earth-mover distance on the " +
      "cents grid") {
    import spark.implicits._
    // All ref mass at 0, all cur mass at 100 cents: W1 = 1.00 currency
    // unit, and the full observed range -> w1_rel = 1.0.
    val counts = Seq(("a", 0L, 1L, 0L), ("a", 100L, 0L, 1L))
      .toDF("g", "cents", "c_ref", "c_cur")
    val got = graft.engine.Rollup.w1Report(counts, "g", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))
    assert(got.toSeq === Seq(("a", 1L, 1L, 1.0, 1.0, "drifted")))
  }

  test("signSignature packs exactly the positive dimensions; Hamming " +
      "top-k counts exactly the sign flips") {
    import spark.implicits._
    def vec(pos: Set[Int]): Array[Float] =
      Array.tabulate(64)(j => if (pos(j)) 1.0f else -1.0f)
    val df = Seq(
      (0L, vec(Set(0, 31, 32))), // lo bits 0+31, hi bit 0
      (1L, vec(Set(0, 31, 32))), // identical -> hamming 0
      (2L, vec(Set(0, 31, 63))), // differs in dims 32 and 63 -> 2
      (3L, vec(Set.empty)), // differs in all three set dims -> 3
    ).toDF("vec_id", "embedding")
    val sigs = graft.ext.Similarity.signSignature(df, "vec_id",
        "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(sigs(0L) === ((1L + (1L << 31), 1L)))
    assert(sigs(3L) === ((0L, 0L)))
    val top = graft.ext.Similarity.binaryHammingTopK(df, "vec_id",
        "embedding", col("vec_id") === 0, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.toSeq === Seq((1L, 0L, 1L), (2L, 2L, 2L), (3L, 3L, 3L)))
  }
}
