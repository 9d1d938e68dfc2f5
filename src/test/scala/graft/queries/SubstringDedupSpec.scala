package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Dedup

/** Semantic pins for the substring-level exact dedup (Lee et al. 2021
  * ExactSubstr): the oracle gate pins cross-engine parity on the fixture;
  * these pin the METHOD's claims on a handcrafted corpus where the right
  * answer is computable by eye — cross-doc spans, self-repeats, the
  * all-occurrences cut, and the short-doc guard.
  */
class SubstringDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val L = 5 // small dial so handcrafted docs stay readable

  // 30 distinct filler tokens nothing else reuses
  private def filler(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  private val sharedSpan = "alpha bravo charlie delta echo" // 5 tokens

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def flagged(df: org.apache.spark.sql.DataFrame) =
    Dedup.substringDupPositions(df, "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("a span shared by two docs flags exactly its gram positions in both") {
    val df = corpus(
      1L -> s"${filler("a", 8)} $sharedSpan ${filler("b", 8)}",
      2L -> s"${filler("c", 3)} $sharedSpan ${filler("d", 10)}")
    // the ONLY duplicated 5-gram is the shared span itself: one gram
    // position per doc (pos 8 in doc 1, pos 3 in doc 2)
    assert(flagged(df) == Set((1L, 8L), (2L, 3L)))
  }

  test("a self-repeat within one doc is flagged (paper semantics)") {
    val df = corpus(3L -> s"$sharedSpan ${filler("e", 6)} $sharedSpan")
    assert(flagged(df) == Set((3L, 0L), (3L, 11L)))
  }

  test("docs shorter than L tokens can never flag") {
    val df = corpus(4L -> "alpha bravo charlie", 5L -> "alpha bravo charlie")
    assert(flagged(df).isEmpty)
  }

  test("rewrite drops ALL occurrences of the duplicated span and nothing " +
      "else; unaffected docs keep their full text") {
    val d1 = s"${filler("a", 8)} $sharedSpan ${filler("b", 8)}"
    val d2 = s"${filler("c", 3)} $sharedSpan ${filler("d", 10)}"
    val d3 = filler("z", 12)
    // run the registered query body against a temp fixture dir so the
    // rewrite is exercised exactly as the gate runs it
    val tmp = graft.queries.Scratch.newDir("substr-spec")
    corpus(1L -> d1, 2L -> d2, 3L -> d3)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // registered query uses L=20; handcrafted docs need the small dial, so
    // reproduce its exact shape at L=5 via the shared helper
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    val flag = Dedup.substringDupPositions(docs, "doc_id", "text", L)
      .withColumn("fpos", col("pos"))
    val toks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .withColumn("pos", col("pos").cast("long"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = toks.join(flag, Seq("doc_id", "pos"), "left")
      .withColumn("cov_end",
        max(when(col("fpos").isNotNull, col("fpos") + lit(L - 1))).over(w))
      .withColumn("kept", col("cov_end").isNull || col("cov_end") < col("pos"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(when(col("kept"),
          struct(col("pos"), col("token"))))), x => x("token")), " ")
        .as("text_kept"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == s"${filler("a", 8)} ${filler("b", 8)}")
    assert(kept(2L) == s"${filler("c", 3)} ${filler("d", 10)}")
    assert(kept(3L) == d3)
  }

  test("overlapping duplicated grams coalesce into ONE maximal span — " +
      "flags at {0, 2} with a gap at 1 must not double-count") {
    // Doc A = t0..t21; B repeats A[0..19], C repeats A[2..21]. A's 20-gram
    // at pos 0 and pos 2 are duplicated but the one at pos 1 is not, so a
    // naive consecutive-run merge would emit two overlapping spans
    // [0,19]+[2,21] (40 'span tokens' for 22 covered). The maximal-span
    // contract demands ONE span [0,21].
    val aToks = (0 until 22).map(i => s"ov$i")
    val rows = Seq(
      (1L, aToks.mkString(" ")),
      (2L, aToks.take(20).mkString(" ")),
      (3L, aToks.drop(2).mkString(" ")))
    val tmp = java.nio.file.Files.createTempDirectory("graft-span-overlap")
    try {
      import spark.implicits._
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.parquet(tmp.toString + "/documents.parquet")
      val spans = Docs.queries("q_dedup_substring")(spark, tmp.toString)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(spans.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 21L, 22L)),
        s"doc 1 must carry exactly one merged span: ${spans.mkString(";")}")
      assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 19L, 20L)))
      assert(spans.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 19L, 20L)))
      // the rewrite's coverage agrees with the merged spans
      val kept = Docs.queries("q_dedup_substring_kept")(spark, tmp.toString)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(kept == Map(1L -> 22L, 2L -> 20L, 3L -> 20L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("fixture sanity: registered queries produce spans >= 20 tokens and " +
      "kept+dropped partitions every doc's tokens") {
    val dir = "/root/testdata/sf0.001"
    val spans = Docs.queries("q_dedup_substring")(spark, dir).collect()
    assert(spans.forall(r => r.getLong(3) >= 20L),
      "every maximal span must be at least the dial length")
    assert(spans.forall(r =>
      r.getLong(2) - r.getLong(1) + 1 == r.getLong(3)))
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = Docs.queries("q_dedup_substring_kept")(spark, dir).collect()
    assert(kept.length == docs.size, "one output row per input doc")
    kept.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == docs(r.getLong(0)),
        s"kept+dropped must equal token count for doc ${r.getLong(0)}")
    }
  }
}
