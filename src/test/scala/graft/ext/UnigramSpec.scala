package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic pins for the unigram-LM tokenizer (Kudo 2018 hard-EM
  * variant): the oracle gate pins Spark==DuckDB; these pin the claims
  * the implementation makes — DP optimality, reconstruction, cost
  * additivity, coverage after pruning — so a refactor that breaks both
  * engines the same way still fails here.
  */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def pieceSeq(repr: String): Seq[String] =
    repr.stripPrefix("[").stripSuffix("]").split("\\]\\[").toSeq

  test("hand corpus: seed counts, costs, and the Viterbi argmin") {
    // Corpus "ab ab b": words ab(freq 2), b(1). Substrings (freq-
    // weighted): a=2, b=3, ab=2. Seed (topK covers all) = {a, b, ab}.
    // Costs: total=7, |P|=3 → cost(p) = floor(ln(10/(cnt+1))·1e6+0.5):
    //   a → ln(10/3)·1e6 ≈ 1203973, b → ln(10/4)·1e6 ≈ 916291,
    //   ab → ln(10/3)·1e6 ≈ 1203973.
    // 'ab' segments as [ab] (1203973) vs [a][b] (2120264) → [ab].
    val (pieces, seg) = Unigram.train(docs("ab ab b"), "text")
    val costs = pieces.map(p => p.piece -> p.costMicro).toMap
    assert(costs.keySet === Set("a", "b", "ab"))
    val rows = seg.collect().map(r =>
      r.getString(0) -> (r.getLong(2), r.getString(4))).toMap
    assert(rows("ab")._2 === "[ab]")
    assert(rows("b")._2 === "[b]")
    assert(rows("ab")._1 === costs("ab"))
    assert(rows("b")._1 === costs("b"))
  }

  test("tie-break: equal-cost segmentations resolve to the lex-min repr") {
    // Hand-built costs force an exact tie: cost([ab]) = 200 =
    // cost([a][b]) — the DP must pick '[a][b]' ('[a]' then ']' 0x5D <
    // 'b' 0x62), the same total order the oracle's exhaustive min uses.
    import spark.implicits._
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    val pieces = Seq(Unigram.Piece("a", 1, 100L),
      Unigram.Piece("b", 1, 100L), Unigram.Piece("ab", 1, 200L))
    val row = Unigram.segment(words, pieces, 4).collect().head
    assert(row.getLong(2) === 200L)
    assert(row.getString(4) === "[a][b]")
    // And when the whole-word piece is strictly cheaper it must win.
    val cheap = pieces.map(p =>
      if (p.piece == "ab") p.copy(costMicro = 199L) else p)
    val row2 = Unigram.segment(words, cheap, 4).collect().head
    assert((row2.getLong(2), row2.getString(4)) === ((199L, "[ab]")))
  }

  test("pruning drops a candidate the E-step never uses: 'aa aa' ends " +
      "with the char tokenizer") {
    // Substring counts: a=4, aa=2 → round-1 costs make [a][a] strictly
    // cheaper than [aa], so 'aa' gets zero usage and the prune removes
    // it; the final table is exactly the covering singles.
    val (pieces, seg) = Unigram.train(docs("aa aa"), "text")
    assert(pieces.map(_.piece) === Seq("a"))
    assert(seg.collect().head.getString(4) === "[a][a]")
  }

  test("fixture corpus: every segmentation reconstructs its word, costs " +
      "are additive over the final piece table, and the DP never loses " +
      "to the all-singles segmentation") {
    val docsDf = t()
    val (pieces, seg) = Unigram.train(docsDf, "text")
    val costs = pieces.map(p => p.piece -> p.costMicro).toMap
    val rows = seg.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (word, cost, repr) = (r.getString(0), r.getLong(2),
        r.getString(4))
      val ps = pieceSeq(repr)
      assert(ps.mkString("") === word, s"reconstruction of $word")
      assert(ps.map(costs).sum === cost, s"cost additivity of $word")
      val singles = word.map(c => costs(c.toString)).sum
      assert(cost <= singles, s"DP beat by singles on $word")
    }
    // Separation: the learned vocab must actually deploy multi-char
    // pieces somewhere, or the whole exercise is a char tokenizer.
    assert(rows.exists(r => pieceSeq(r.getString(4)).exists(_.length > 1)))
  }

  test("pruning keeps coverage: every single char of the corpus survives " +
      "round 2, and the piece table is bounded by keepK + alphabet") {
    val (pieces, _) = Unigram.train(t(), "text")
    val words = Unigram.vocabWords(t(), "text").collect()
      .map(_.getString(0))
    val chars = words.flatMap(_.toSeq).map(_.toString).toSet
    val pieceSet = pieces.map(_.piece).toSet
    assert(chars.subsetOf(pieceSet))
    assert(pieces.size <= 32 + chars.size)
    assert(pieces.map(_.piece).distinct.size === pieces.size)
  }

  test("usage totals reconcile: sum(freq · n_pieces) over the " +
      "segmentation equals the total usage count") {
    val (_, seg) = Unigram.train(t(), "text")
    val direct = seg.select(sum(col("freq") * col("n_pieces")))
      .head().getLong(0)
    val viaUsage = Unigram.usageCounts(seg)
      .select(sum(col("cnt"))).head().getLong(0)
    assert(direct === viaUsage)
  }

  test("doc-grain totals reconcile: q_unigram_doc_tokens sums to the " +
      "segmentation's freq-weighted piece count, word for word") {
    // the doc-grain row re-joins the exploded word stream to the piece
    // table, so its corpus totals must equal the vocab-grain identity —
    // sum(n_words) == sum(freq) and sum(n_unigram_tokens) ==
    // sum(freq · n_pieces) — or the join is dropping/duplicating words
    val (_, seg) = Unigram.train(t(), "text")
    val vocab = seg.select(sum(col("freq")).as("w"),
      sum(col("freq") * col("n_pieces")).as("p")).head()
    val docGrain = graft.queries.Docs.queries("q_unigram_doc_tokens")(
      spark, dir)
      .select(sum(col("n_words")).as("w"),
        sum(col("n_unigram_tokens")).as("p")).head()
    assert(docGrain.getLong(0) === vocab.getLong(0))
    assert(docGrain.getLong(1) === vocab.getLong(1))
  }

  private def t() =
    spark.read.parquet(s"$dir/documents.parquet")
}
