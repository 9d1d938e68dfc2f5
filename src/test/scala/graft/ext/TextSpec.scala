package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def statsOf(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text").select(
      Text.nTokens(col("text")).as("nt"),
      Text.nDistinctTokens(col("text")).as("nd"),
      Text.nRegexTokens(col("text")).as("nr"),
      Text.avgTokenLen(col("text")).as("avg"),
      Text.langId(col("text")).as("lang"),
      Text.fingerprint(col("text")).as("fp")).head()
  }

  test("token counts and mean token length") {
    val r = statsOf("the cat sat on the mat")
    assert(r.getLong(0) == 6)
    assert(r.getLong(1) == 5) // "the" twice
    assert(r.getLong(2) == 6)
    assert(r.getDouble(3) == 2.8333) // 17 non-space chars / 6 tokens, 4dp
  }

  test("regex tokens split punctuation-glued words") {
    import spark.implicits._
    val r = Seq("foo1,bar2").toDF("text")
      .select(Text.nTokens(col("text")), Text.nRegexTokens(col("text"))).head()
    assert(r.getLong(0) == 1) // one whitespace token
    assert(r.getLong(1) == 2) // two alnum runs
  }

  test("langId picks the stopword-majority language, en wins ties") {
    assert(statsOf("el perro y la casa de los gatos").getString(4) == "es")
    assert(statsOf("der hund und die katze ist hier").getString(4) == "de")
    assert(statsOf("le chat et les chiens des villes une").getString(4) == "fr")
    assert(statsOf("the dog and a cat of it").getString(4) == "en")
    assert(statsOf("zz qq ww").getString(4) == "en") // all-zero tie -> first
  }

  test("fingerprint is whitespace-normalization invariant") {
    val a = statsOf("hello   world").getString(5)
    val b = statsOf("  hello world  ").getString(5)
    assert(a == b && a.length == 32)
  }

  test("vectorized laws over 200 generated docs (counts, fingerprint)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("spark", "join", "the", "a", "row", "scan", "agg")
    val texts = (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val df = texts.toDF("text")
    // law: n_distinct <= n_tokens; both >= 1; regex tokens == tokens here
    val violations = df.filter(
      Text.nDistinctTokens(col("text")) > Text.nTokens(col("text")) ||
      Text.nTokens(col("text")) < 1 ||
      Text.nRegexTokens(col("text")) =!= Text.nTokens(col("text"))).count()
    assert(violations == 0)
    // law: fingerprint invariant under superfluous whitespace
    val fpMismatch = df
      .select(Text.fingerprint(col("text")).as("a"),
        Text.fingerprint(concat(lit("  "), regexp_replace(col("text"), " ",
          "   "), lit(" "))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(fpMismatch == 0)
  }

  test("shingle count law: max(1, n_tokens - 4) shingles per doc") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val texts = (1 to 100).map(_ =>
      (1 to (1 + rnd.nextInt(10))).map(i => s"t${rnd.nextInt(9)}")
        .mkString(" "))
    val bad = texts.toDF("text")
      .select(Text.nTokens(col("text")).as("nt"),
        size(graft.ext.Dedup.shingles(col("text"))).cast("long").as("ns"))
      .filter(col("ns") =!= greatest(lit(1L), col("nt") - 4)).count()
    assert(bad == 0)
  }

  test("qualityScore stays in [0,1] and rewards diversity") {
    import spark.implicits._
    val r = Seq("the a of and to the a of and to", "x x x x x x x x x x")
      .toDF("text").select(Text.qualityScore(col("text"))).collect()
    val (stopHeavy, monotone) = (r(0).getDouble(0), r(1).getDouble(0))
    assert(stopHeavy >= 0 && stopHeavy <= 1 && monotone >= 0 && monotone <= 1)
    assert(stopHeavy > monotone) // stopword density contributes
  }
}
