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

  test("connectedComponentsStar: label-equal to propagation, and it " +
      "finishes the long chain propagation's round budget cannot") {
    import spark.implicits._
    // same mixed-orientation fixture as the propagation pin
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (6L, 5L))
      .toDF("doc_a", "doc_b")
    val star = Dedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
    // empty input: no nodes, no crash
    assert(Dedup.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"),
      "doc_a", "doc_b").count() == 0)
    // label equality with propagation on a branchy random-ish graph
    val rng = new scala.util.Random(7)
    val edges = (1 to 120).map(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val df = edges.toDF("doc_a", "doc_b")
    val a = Dedup.connectedComponents(df, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.connectedComponentsStar(df, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "star labels must equal propagation labels")
    // the giant-diameter regime: a 60-hop chain. Propagation needs a
    // round per hop (20-round default budget throws); the star rounds
    // contract it inside their O(log²) budget.
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "doc_a", "doc_b").count()
    }
    val starChain = Dedup.connectedComponentsStar(chain, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(starChain.length == 61 && starChain.forall(_._2 == 0L),
      "every chain node must label to the component minimum")
    // null ids fail loudly, matching the propagation contract
    intercept[IllegalArgumentException] {
      Dedup.connectedComponentsStar(
        Seq(("x", "2"), ("3", "4")).toDF("doc_a", "doc_b"),
        "doc_a", "doc_b").count()
    }
  }

  test("incremental candidate pairs == full-corpus candidates, any split") {
    // Adversarial shapes the fixture oracle can't probe: duplicate groups
    // spanning the batch boundary in BOTH id directions (new id below and
    // above its old twin), a new-new-only pair, and an old-only pair.
    val all = docs(
      1L -> "alpha beta gamma delta epsilon zeta", // dup of 10 (old-old? no: 10 new)
      2L -> "one two three four five six seven",   // dup of 3 (old-old)
      3L -> "one two three four five six seven",
      10L -> "alpha beta gamma delta epsilon zeta", // dup of 1, new, higher id
      4L -> "unique text that matches nothing at all here",
      0L -> "shared body text for boundary check pair", // new, LOWER id
      7L -> "shared body text for boundary check pair", // old twin
      12L -> "new new pair body aa bb cc dd ee",        // new-new pair
      14L -> "new new pair body aa bb cc dd ee")
    val isNew = (id: Long) => id % 2 == 0 // 0,10,12,14,4,2 new; 1,3,7 old
    val oldDocs = all.filter(col("doc_id") % 2 =!= 0)
    val newDocs = all.filter(col("doc_id") % 2 === 0)
    def bands(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshBands(Dedup.minhashSignatures(df, "doc_id", "text"), "doc_id")
    val full = Dedup.minhashPairs(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = (Dedup.bandsToCandidatePairs(bands(oldDocs), "doc_id")
        .unionAll(Dedup.incrementalCandidatePairs(
          bands(oldDocs), bands(newDocs), "doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == full)
    // sanity on the shapes: boundary pairs in both directions + new-new
    assert(full.contains((0L, 7L)) && full.contains((1L, 10L)) &&
      full.contains((12L, 14L)) && full.contains((2L, 3L)))
    assert(isNew(0L) && !isNew(7L) && !isNew(1L) && isNew(10L))
  }

  test("prefix-filtered join equals the blocking-free inverted-index " +
      "join — the filter is lossless") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pp = key(Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 0.5))
    val full = key(Dedup.jaccardPairs(docs, "doc_id", "text", 0.5))
    assert(pp === full && pp.nonEmpty)
    // Tighter threshold shortens prefixes; equality must still hold.
    val pp8 = key(Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 0.8))
    val full8 = key(Dedup.jaccardPairs(docs, "doc_id", "text", 0.8))
    assert(pp8 === full8)
  }

  test("leakage-safe splits: a near-dup cluster never straddles a split") {
    // the invariant the operator exists for, asserted on the real fixture:
    // every assignment unit maps to exactly ONE split, every doc is
    // assigned, and clustered docs share their cluster-mates' split
    val out = graft.SparkEntry.queries("q_split_leakage_safe")(
      spark, "/root/testdata/sf0.001")
    val splitsPerUnit = out.groupBy(col("unit_id"))
      .agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).head.getLong(0)
    assert(splitsPerUnit == 1L)
    val docsTotal = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(out.select(col("doc_id")).distinct().count() == docsTotal)
    // and it is not vacuous: at least one multi-member unit exists
    val biggest = out.groupBy(col("unit_id")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(biggest >= 2L)
  }
}
