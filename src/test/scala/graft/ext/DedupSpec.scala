package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("shingles: 5-gram windows; short docs collapse to whole text") {
    import spark.implicits._
    val out = Seq("a b c d e f", "tiny doc").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh")).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c d e", "b c d e f"))
    assert(out(1).getSeq[String](0) == Seq("tiny doc"))
  }

  test("minhash: identical docs collide in every band, disjoint docs in none") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words about spark catalyst planning here"))
    val pairs = Dedup.minhashPairs(d, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("jaccard: exact similarity for a hand-computed overlap") {
    // 8-token docs -> 4 shingles each, sharing 3 -> j = 3 / (4+4-3) = 0.6
    val d = docs(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"))
    val r = Dedup.jaccardPairs(d, "doc_id", "text", 0.1).head()
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getDouble(2) == 0.6)
  }

  test("jaccard respects the threshold") {
    val d = docs(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"))
    assert(Dedup.jaccardPairs(d, "doc_id", "text", 0.7).isEmpty)
  }

  test("simhash: identical docs -> hamming 0; sig packing stays in range") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "entirely unrelated vocabulary describing database engines"))
    val out = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 0)
    val rows = out.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(rows.head.getLong(2) == 0L)
  }

  test("simhash signatures are 64-bit strings") {
    val sig = Dedup.simhashSignatures(
      docs((1L, "some tokens for hashing here")), "doc_id", "text").head()
    val s = sig.getString(1)
    assert(s.length == 64 && s.forall(c => c == '0' || c == '1'))
  }

  test("minhash signature is stable across runs (deterministic hashing)") {
    val d = docs((1L, "a b c d e f g h i j"))
    val s1 = Dedup.minhashSignatures(d, "doc_id", "text").head().toSeq
    val s2 = Dedup.minhashSignatures(d, "doc_id", "text").head().toSeq
    assert(s1 == s2)
  }

  test("connectedComponents labels every component by its min id") {
    import spark.implicits._
    // a 4-node CHAIN (diameter 3 — needs multiple propagation rounds),
    // one 2-node pair, edges deliberately in mixed orientation
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (6L, 5L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
    // empty pair set: no nodes, no crash
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"),
      "doc_a", "doc_b").count() == 0)
    // truncation is an ERROR, not silently-wrong labels: the chain needs
    // more than one round, so maxIter = 1 must throw
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "doc_a", "doc_b", maxIter = 1)
        .count()
    }
  }
}
