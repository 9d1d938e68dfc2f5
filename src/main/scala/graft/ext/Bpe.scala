package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") over a
  * document corpus — the missing piece between the engine's token-COUNT
  * proxies (graft.ext.Text.nRegexTokens) and an actual learned subword
  * vocabulary.
  *
  * Distribution shape (the reason BPE training is feasible at corpus
  * scale): the corpus is scanned ONCE, into a (word, freq) vocabulary
  * table — Zipf makes |V| grow far sublinearly in corpus tokens, so every
  * merge round thereafter runs over the small vocab table, never the
  * corpus. Each round is one explode → hash-agg (partial aggregation
  * map-side) over the vocab's adjacent symbol pairs plus ONE bounded
  * driver collect (the argmax row — exactly the kmeans-step precedent in
  * graft.ext.Similarity.centroidRefinement's loop callers), then a
  * codegen'd literal `replace` projection applies the merge. The vocab is
  * localCheckpointed once after the corpus scan; the per-round replaces
  * stack as collapsed projections on top, so no round rescans the corpus.
  *
  * Determinism / oracle parity: pair counts are integer sums of integer
  * frequencies (order-free); the winning pair is (count DESC, symA ASC,
  * symB ASC) — ASCII collation on [a-z]+ symbols, identical in DuckDB.
  * Merge application is greedy-leftmost, encoded as a literal string
  * replace over the BRACKETED symbol representation '[h][e][l][l][o]':
  * `replace(repr, '[a][b]', '[ab]')` replaces non-overlapping leftmost
  * occurrences in both engines, which IS the BPE merge rule (in 'aaa',
  * pair (a,a) merges once at the left: '[aa][a]'). Symbols never contain
  * brackets (the alphabet is [a-z]), so splitting the repr on '][' after
  * trimming the outer brackets recovers the symbol array exactly.
  */
object Bpe {

  /** One learned merge: at `step`, symbols (symA, symB) — the corpus-wide
    * most frequent adjacent pair, `pairCount` weighted occurrences —
    * fused into symA+symB.
    */
  final case class MergeRule(step: Long, symA: String, symB: String,
      pairCount: Long)

  /** (word, repr, freq) vocabulary from the corpus: lowercase [a-z]+ runs
    * (the engine's established RE2-safe tokenization), counted in one
    * shuffle, each word seeded as its character sequence in bracketed
    * form. This is the ONLY operation that touches the corpus.
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"),
        regexp_replace(col("word"), "(.)", "[$1]").as("repr"),
        col("freq"))

  /** Adjacent symbol-pair frequencies of the current vocab, weighted by
    * word frequency — the naive overlap count of the published algorithm
    * ('aaa' contributes (a,a) twice). One-symbol words contribute no
    * pairs and are filtered before the transform (Spark's `sequence`
    * would otherwise produce a DESCENDING [0,-1] range, not an empty
    * one).
    */
  private[ext] def pairCounts(v: DataFrame): DataFrame =
    v.select(split(trim(col("repr"), "[]"), "\\]\\[").as("s"), col("freq"))
      .where(size(col("s")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(s) - 2)," +
          " i -> struct(s[i] AS a, s[i + 1] AS b))")).as("p"),
        col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Learn up to `rounds` merges. Returns the ordered rules and the final
    * vocabulary (word, repr, freq) with all merges applied — the trained
    * tokenizer's segmentation of every corpus word. Stops early (like the
    * published algorithm) when no adjacent pair remains — a degenerate or
    * empty corpus yields fewer (possibly zero) rules, never a throw.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int)
      : (Seq[MergeRule], DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var v = vocab(docs, textCol).localCheckpoint(false)
    val rules = Seq.newBuilder[MergeRule]
    var step = 1
    var exhausted = false
    while (step <= rounds && !exhausted) {
      // Bounded collect: TakeOrderedAndProject of exactly one row.
      val top = pairCounts(v)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += MergeRule(step.toLong, a, b, cnt)
        // Symbols are [a-z]+ by construction, so the literal is SQL-safe.
        v = v.withColumn("repr",
          expr(s"replace(repr, '[$a][$b]', '[$a$b]')"))
        step += 1
      }
    }
    (rules.result(), v)
  }

  /** Final segmentation view of [[learnMerges]]'s vocabulary:
    * (word, freq, n_pieces, pieces) — the trained tokenizer's
    * pieces-per-word table, the quantity tokenizer fertility/compression
    * audits read.
    */
  def segmentation(finalVocab: DataFrame): DataFrame =
    finalVocab.select(
      col("word"),
      col("freq").cast("long").as("freq"),
      size(split(trim(col("repr"), "[]"), "\\]\\["))
        .cast("long").as("n_pieces"),
      col("repr").as("pieces"))
}
