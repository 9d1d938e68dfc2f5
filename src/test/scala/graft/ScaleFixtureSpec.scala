package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the scale-suite replicator: the growth measurements in
  * BENCH_SF1.json are only meaningful if replication (a) grows joins
  * linearly, (b) keeps replicas key-disjoint, and (c) perturbs text /
  * embeddings without changing their statistics — otherwise the dedup
  * and similarity families would be measured against a degenerate
  * everything-is-duplicated corpus.
  */
class ScaleFixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("row counts scale by the factor; replica keys are disjoint") {
    val docs = ScaleFixture.replicateTable(spark, dir, "documents", 3)
    val baseN = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(docs.count() === baseN * 3)
    assert(docs.select("doc_id").distinct().count() === baseN * 3)
  }

  test("FK chains grow linearly: lineitem-orders join count scales") {
    val li = ScaleFixture.replicateTable(spark, dir, "lineitem", 2)
    val os = ScaleFixture.replicateTable(spark, dir, "orders", 2)
    val joined = li.join(os, col("l_orderkey") === col("o_orderkey")).count()
    val baseJoined = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined === baseJoined * 2)
  }

  test("document perturbation preserves length, breaks cross-replica equality") {
    val docs = ScaleFixture.replicateTable(spark, dir, "documents", 2)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    val paired = docs.filter(col("doc_id") < ScaleFixture.Offset).as("a")
      .join(docs.filter(col("doc_id") >= ScaleFixture.Offset).as("b"),
        col("a.doc_id") + ScaleFixture.Offset === col("b.doc_id"))
    // translate is length-preserving on every row...
    assert(paired.filter(col("a.len") =!= col("b.len")).count() === 0)
    // ...and no non-trivial document survives the substitution verbatim
    // (a text with zero letters from the substitution alphabet would —
    // the fixture has none at any sf).
    assert(paired.filter(col("a.text") === col("b.text")).count() === 0)
  }

  test("embedding rotation preserves the norm, breaks alignment") {
    val emb = ScaleFixture.replicateTable(spark, dir, "embeddings", 2)
    def normOf(idFilter: org.apache.spark.sql.Column) = emb.filter(idFilter)
      .select(col("vec_id") % ScaleFixture.Offset.toInt,
        round(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x * x), 4).as("n2"))
    val a = normOf(col("vec_id") < ScaleFixture.Offset)
    val b = normOf(col("vec_id") >= ScaleFixture.Offset)
    assert(a.exceptAll(b).count() === 0) // identical norm multiset, by id
    // Rotation must actually move coordinates: replica-1 vectors differ
    // from their replica-0 source.
    val firstA = emb.filter(col("vec_id") === 0)
      .select(element_at(col("embedding"), 1)).head().getFloat(0)
    val firstB = emb.filter(col("vec_id") === ScaleFixture.Offset)
      .select(element_at(col("embedding"), 1)).head().getFloat(0)
    assert(firstA !== firstB)
  }

  test("replica 0 is byte-identical to the base table") {
    val li = ScaleFixture.replicateTable(spark, dir, "lineitem", 2)
      .filter(col("l_orderkey") < ScaleFixture.Offset)
    val baseLi = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(li.exceptAll(baseLi).count() === 0)
    assert(baseLi.exceptAll(li).count() === 0)
  }

  test("an id at the offset fails loudly instead of colliding") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scalefix").toString
    Seq((ScaleFixture.Offset, "x")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      ScaleFixture.replicateTable(spark, tmp, "documents", 2).count()
    }
    assert(e.getMessage.contains("offset"))
  }

  test("a factor past the (substitution x word-bijection) family fails " +
      "loudly instead of wrapping into quadratic duplicate structure") {
    val e = intercept[IllegalArgumentException] {
      ScaleFixture.replicateTable(spark, dir, "documents", 105)
    }
    assert(e.getMessage.contains("wrap"))
  }

  test("fourth-decade factors keep every replica pair SHINGLE-disjoint " +
      "on an adversarial corpus built from the exception words") {
    // The four-block family's verified exception set is {a, agg}: 'a' is
    // invariant under every position bijection and 'agg' maps to the
    // palindrome 'gag' under both swap01 and rot2, so those words DO
    // coincide across equal-power replica pairs — safety rests on the
    // corpus never running 5 of them consecutively (measured max run: 4
    // at every SF). Replicate a handcrafted worst-case corpus (runs of
    // exactly 4, embedded mid-document) at the FULL factor 104 and
    // assert zero cross-replica 5-token shingle matches — covering the
    // block boundaries (25,26), (51,52), (77,78) and every equal-power
    // cross-block pair (r, r+26k).
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scalefix-f104")
      .toString
    Seq(
      (0L, "a agg a agg the query spark a agg a agg hash join value"),
      (1L, "data a agg a agg data window sort a agg agg a merge key"),
      (2L, "agg a agg a stream table a a agg agg batch filter row"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val docs = ScaleFixture.replicateTable(spark, tmp, "documents", 104)
      .select((col("doc_id") / ScaleFixture.Offset).cast("int").as("r"),
        col("text"))
    val sh = docs.select(col("r"), explode(expr(
      "transform(sequence(1, greatest(size(split(text, ' ')) - 4, 1))," +
        " i -> array_join(slice(split(text, ' '), i, 5), ' '))"))
      .as("shingle"))
    val crossReplica = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("r")).as("nr"))
      .filter(col("nr") > 1).count()
    assert(crossReplica === 0)
  }

  test("fourth-decade embeddings: the wrap block negates (norms and " +
      "within-replica geometry exact, cross-wrap cosine is -1, pairwise " +
      "distinct)") {
    // sf0.001 embeddings are 64-dim, so factor 104 exercises the
    // negation block (r >= 64). Replica 64 is rotation 0 negated: its
    // vectors must be the exact elementwise negation of replica 0 —
    // cosine -1, never +1, so no dedup/top-k can pick the pair.
    val emb = ScaleFixture.replicateTable(spark, dir, "embeddings", 104)
      .filter(col("vec_id") % ScaleFixture.Offset === 0)
      .select((col("vec_id") / ScaleFixture.Offset).cast("int").as("r"),
        col("embedding"))
    val rows = emb.filter(col("r").isin(0, 1, 64, 65)).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(rows(64) == rows(0).map(-_))
    assert(rows(65) == rows(1).map(-_))
    // distinctness across the whole replica axis for one base vector:
    // 104 distinct (rotation, sign) images
    assert(emb.select("embedding").distinct().count() === 104)
  }

  test("the four-block family's coincidence set and max exception-word " +
      "run are recomputed from the REAL fixture vocabulary at every SF " +
      "(the safety argument must not live only in a comment and a " +
      "handcrafted corpus)") {
    // Independent reimplementation of the replica transform family on
    // single words: replica r applies the (r mod 26)-th cycle power,
    // then the (r / 26)-th position bijection; translate (per-char sub)
    // commutes with position bijections, so the image is
    // block(sub(w, k)) in either order.
    val alpha = "etaoinshrdlcumwfgypbvkjxqz"
    def sub(w: String, k: Int): String = w.map { ch =>
      val i = alpha.indexOf(ch)
      if (i < 0) ch else alpha((i + k) % alpha.length)
    }
    def block(w: String, b: Int): String = b match {
      case 0 => w
      case 1 => w.reverse
      case 2 => if (w.length >= 2) s"${w(1)}${w(0)}${w.drop(2)}" else w
      case _ => if (w.length >= 2) w.drop(2) + w.take(2) else w
    }
    // every SF the scale harness can use as a base (ScaleSuite default
    // is sf0.1; specs and the warmup use the smaller two)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val texts = spark.read.parquet(s"$d/documents.parquet")
        .select("text").collect().map(_.getString(0))
      val vocab = texts.flatMap(_.split(" ")).distinct.toSeq
      // vocabulary contract the cycle-power argument rests on: words are
      // pure lowercase a-z (a word outside the substitution alphabet —
      // e.g. '...' or 'x1' — would be partially or fully INVARIANT under
      // every transform and silently join the exception set)
      vocab.foreach(w => assert(w.matches("[a-z]+"),
        s"non-alphabetic fixture word '$w' in $d breaks the " +
          "fixed-point-free substitution argument"))
      // the coincidence set: words whose 104 replica images are not all
      // distinct (any repeat = two replicas agree on this word)
      val exceptions = vocab.filter { w =>
        val images =
          for (b <- 0 to 3; k <- 0 until alpha.length)
            yield block(sub(w, k), b)
        images.distinct.size < images.size
      }.toSet
      assert(exceptions.subsetOf(Set("a", "agg")),
        s"coincidence set $exceptions in $d exceeds the documented " +
          "{a, agg} bound — a new fixture word collides across blocks " +
          "(e.g. any 2-letter word: swap01 = reverse and rot2 = id)")
      // the max consecutive run of exception words in the REAL corpus
      // must stay under the 5-token shingle, or cross-replica shingle /
      // fingerprint coincidences become possible
      val maxRun = texts.map { t =>
        var run = 0
        var best = 0
        t.split(" ").foreach { w =>
          if (exceptions.contains(w)) { run += 1; best = math.max(best, run) }
          else run = 0
        }
        best
      }.max
      assert(maxRun < 5,
        s"max exception-word run $maxRun in $d reaches the 5-token " +
          "shingle — cross-replica shingle coincidence is possible")
    }
  }

  test("third-decade factors keep every replica pair SHINGLE-disjoint: " +
      "the reversal block composes cleanly with the cycle powers") {
    // factor 30 exercises both blocks plus the cross-block equal-power
    // pairs (r, r+26) — the palindrome case: the corpus's longest
    // consecutive-palindrome run is 4, so no 5-token shingle can
    // coincide across ANY two distinct replicas (within one replica,
    // shared shingles are the preserved duplicate structure, by design).
    val docs = ScaleFixture.replicateTable(spark, dir, "documents", 30)
      .select((col("doc_id") / ScaleFixture.Offset).cast("int").as("r"),
        col("doc_id"), col("text"))
    val sh = docs
      .select(col("r"), col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(split(text, ' ')) - 4, 1))," +
          " i -> array_join(slice(split(text, ' '), i, 5), ' '))"))
        .as("shingle"))
    val crossReplica = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.r") < col("b.r"))
      .count()
    assert(crossReplica === 0)
  }

  test("second-decade factors keep every replica pair textually disjoint " +
      "(26-cycle powers are fixed-point-free)") {
    // factor 12 exercises powers past the r12 10-letter alphabet's wrap
    // point: under the old scheme replicas 1 and 11 would be
    // byte-identical; under the 26-cycle every pair must differ.
    val docs = ScaleFixture.replicateTable(spark, dir, "documents", 12)
      .select((col("doc_id") / ScaleFixture.Offset).cast("int").as("r"),
        (col("doc_id") % ScaleFixture.Offset).as("base_id"), col("text"))
    val collisions = docs.as("a").join(docs.as("b"),
        col("a.base_id") === col("b.base_id") &&
          col("a.r") < col("b.r") && col("a.text") === col("b.text"))
      .count()
    assert(collisions === 0)
  }

  test("a factor past twice the embedding dimension fails loudly instead " +
      "of aliasing replica (rotation, sign) keys") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scalefix-dim")
      .toString
    Seq((0L, Array(1.0f, 2.0f, 3.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      ScaleFixture.replicateTable(spark, tmp, "embeddings", 7)
    }
    assert(e.getMessage.contains("dim"))
    // 2x dim exactly still replicates cleanly (6 distinct images)
    assert(ScaleFixture.replicateTable(spark, tmp, "embeddings", 6)
      .select("embedding").distinct().count() === 6)
  }

  test("an empty source table replicates to empty, no NPE from the " +
      "null max-id guard") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("scalefix-empty")
      .toString
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    assert(ScaleFixture.replicateTable(spark, tmp, "documents", 3)
      .count() === 0)
  }
}
