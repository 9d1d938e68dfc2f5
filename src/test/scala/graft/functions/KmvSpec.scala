package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Example-based laws of the KMV sketch state machine ([[Kmv.insert]] and
  * the Aggregator built on it); the order/split-invariance PROPERTIES
  * live in [[KmvProps]].
  */
class KmvSpec extends AnyFunSuite {

  private val K = 8

  private def sketchOf(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(Array.emptyLongArray)((b, v) => Kmv.insert(b, v, K))

  test("merge is idempotent: folding a sketch into itself is a no-op") {
    val agg = new Kmv.KmvAgg(K)
    val s = sketchOf(Seq(5L, 3L, 99L, 3L, 7L, 12L, 1L, 40L, 41L, 42L))
    assert(agg.merge(s, s).toSeq == s.toSeq)
  }

  test("below k distinct values the buffer IS the exact distinct set") {
    val s = sketchOf(Seq(9L, 9L, 2L, 7L, 2L))
    assert(s.toSeq == Seq(2L, 7L, 9L))
  }

  test("an overflow value neither enters nor disturbs a full buffer") {
    val full = sketchOf(1L to 8L)
    assert(Kmv.insert(full, 100L, K).toSeq == full.toSeq)
    assert(Kmv.insert(full, 0L, K).toSeq == (0L to 7L).toSeq)
  }

  test("estimator is within the published error envelope on a uniform " +
      "hash stream") {
    // 60-bit md5-prefix hashes of 5000 distinct strings — the exact
    // production feed. KMV-64's relative standard error is ~1/sqrt(62)
    // ≈ 12.7%; assert a generous 4-sigma envelope so the test is a
    // correctness tripwire, not a flake.
    val k = 64
    val m = math.pow(2.0, 60)
    val hashes = (0 until 5000).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"val-$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val buf = hashes.foldLeft(Array.emptyLongArray)(
      (b, v) => Kmv.insert(b, v, k))
    assert(buf.length == k)
    val est = (k - 1).toDouble * m / buf(k - 1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.51,
      s"estimate $est too far from 5000")
  }

  test("kmvAgg over a nullable hash column ignores NULLs like " +
      "countDistinct (no spurious 0L minimum)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq[(Int, Option[Long])](
      (1, Some(10L)), (1, None), (1, Some(3L)), (1, Some(10L)),
      (2, None), (2, None)).toDF("g", "h")
    val out = df.groupBy(col("g"))
      .agg(Kmv.kmvAgg(col("h"), K).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(out(1) == Seq(3L, 10L)) // no 0L from the NULL row
    assert(out(2).isEmpty) // all-null group = empty sketch, not [0]
  }
}
