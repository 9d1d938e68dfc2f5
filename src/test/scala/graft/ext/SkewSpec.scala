package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("saltedJoin returns exactly the rows of the plain join") {
    import spark.implicits._
    // skewed left: one hot key with 1000 rows, a cold tail
    val left = ((1 to 1000).map(i => ("hot", i)) ++
      Seq(("cold1", 1), ("cold2", 2), ("orphan", 3))).toDF("k", "v")
    val right = Seq(("hot", 10.0), ("cold1", 20.0), ("cold2", 30.0),
      ("unmatched", 99.0)).toDF("k", "w")

    val salted = Skew.saltedJoin(left, right, "k", factor = 8)
      .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    val plain = left.join(right, "k")
      .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 1002) // 1000 hot + 2 cold; orphan/unmatched drop
  }

  test("salt spreads a hot key over multiple sub-keys") {
    import spark.implicits._
    val left = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    // the REAL derivation saltedJoin uses — a key-only hash regression
    // would collapse this to one bucket and fail here
    val salts = left
      .withColumn("__salt", Skew.saltColumn(left, 8))
      .select("__salt").distinct().count()
    assert(salts >= 6) // ~all 8 salts hit for 1000 rows
  }
}
