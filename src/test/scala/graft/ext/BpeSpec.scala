package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("merges on a hand-checked corpus: counts, order, tie-breaks") {
    // Corpus: "low low lower lowest" — pair counts round 1:
    //   (l,o)=4 (o,w)=4 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    // Tie at 4 breaks to (l,o) ('l' < 'o'); round 2 merges (lo,w)=4;
    // round 3 (low,e)=2; round 4 ties at 1 between (lowe,r), (lowe,s)
    // and (s,t) — (lowe,r) wins on the b tie-break ('r' < 's').
    val (rules, v) = Bpe.learnMerges(docs("low low lower lowest"), "text", 4)
    assert(rules.map(r => (r.symA, r.symB, r.pairCount)) === Seq(
      ("l", "o", 4L), ("lo", "w", 4L), ("low", "e", 2L),
      ("lowe", "r", 1L)))
    val seg = Bpe.segmentation(v).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(seg("low") === "[low]")
    assert(seg("lower") === "[lower]")
    assert(seg("lowest") === "[lowe][s][t]")
  }

  test("greedy-leftmost application: overlapping pair merges once per run") {
    // 'aaa': pair (a,a) counts twice (overlap counting) but merges only
    // at the leftmost occurrence per pass: '[aa][a]'.
    val (rules, v) = Bpe.learnMerges(docs("aaa"), "text", 1)
    assert(rules.head.symA === "a" && rules.head.symB === "a")
    assert(rules.head.pairCount === 2L)
    assert(Bpe.segmentation(v).select("pieces").head().getString(0)
      === "[aa][a]")
  }

  test("pieces always reassemble the word; frequencies are preserved") {
    val base = docs(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs")
    val (_, v) = Bpe.learnMerges(base, "text", 6)
    val bad = Bpe.segmentation(v)
      .withColumn("joined",
        regexp_replace(col("pieces"), "[\\[\\]]", ""))
      .filter(col("joined") =!= col("word"))
      .count()
    assert(bad === 0L)
    val totalFreq = Bpe.segmentation(v).agg(sum("freq")).head().getLong(0)
    assert(totalFreq === 17L) // 9 + 8 words
  }

  test("exhausted corpus stops early instead of throwing") {
    // Single-char words only: no adjacent pairs ever exist.
    val (rules, v) = Bpe.learnMerges(docs("a b c a b"), "text", 5)
    assert(rules.isEmpty)
    assert(Bpe.segmentation(v).count() === 3L)
  }

  test("merge rounds never rescan the corpus: final vocab is one " +
      "collapsed projection over the checkpointed word table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (_, v) = Bpe.learnMerges(docs, "text", 3)
    val p = v.queryExecution.executedPlan.toString()
    assert(!p.contains("FileScan"), p)
    assert(p.contains("ExistingRDD"), p)
    assert("\\bProject\\b".r.findAllIn(p).size === 1, p)
  }

  test("rules step numbering is 1..n and counts are non-increasing " +
      "in a merge-free interaction corpus") {
    // With no multi-round composition possible (all words length 2,
    // disjoint alphabets), counts must be non-increasing across rounds.
    val (rules, _) = Bpe.learnMerges(
      docs("ab ab ab cd cd ef"), "text", 3)
    assert(rules.map(_.step) === Seq(1L, 2L, 3L))
    assert(rules.map(_.pairCount) === Seq(3L, 2L, 1L))
    assert(rules.map(r => r.symA + r.symB) === Seq("ab", "cd", "ef"))
  }
}
