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

  test("winnow: shared substring of >= w+k-1 tokens shares a fingerprint") {
    import spark.implicits._
    // k=4 grams, w=4 windows: any common run of >= 7 tokens must contribute
    // at least one common selected fingerprint (the MOSS guarantee).
    val shared = "q w e r t y u" // 7 tokens
    val df = Seq(s"a b c $shared x y z", s"p $shared m n").toDF("text")
    val fps = df.select(Text.winnow(
        transform(graft.ext.Dedup.shingles(col("text"), 4),
          g => md5(g.cast("binary"))), 4).as("fps"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(fps(0).intersect(fps(1)).nonEmpty)
  }

  test("winnow: short docs keep their single minimum hash") {
    import spark.implicits._
    val fps = Seq("just three tokens").toDF("text")
      .select(Text.winnow(transform(graft.ext.Dedup.shingles(col("text"), 4),
        g => md5(g.cast("binary"))), 4))
      .head().getSeq[String](0)
    assert(fps.length == 1)
  }

  test("redactPii replaces emails and phones, counts match") {
    import spark.implicits._
    val df = Seq("write to a.user@example.com or call 555-0199 now")
      .toDF("text")
    val r = df.select(
      Text.redactPii(col("text")).as("red"),
      Text.countMatches(col("text"), Text.EmailRe).as("ne"),
      Text.countMatches(col("text"), Text.PhoneRe).as("np")).head()
    assert(r.getString(0) == "write to <EMAIL> or call <PHONE> now")
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
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
