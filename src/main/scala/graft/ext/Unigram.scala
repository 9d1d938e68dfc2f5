package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer induction (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates") — the OTHER mainstream tokenizer family beside BPE
  * ([[Bpe]]): instead of greedy bottom-up merges, hold a vocabulary of
  * candidate pieces with probabilities and pick each word's best
  * segmentation under the unigram model, alternating EM rounds with
  * pruning.
  *
  * This implementation is the hard-EM (Viterbi-EM) variant with
  * integer-disciplined scoring, so both engines make every decision
  * identically:
  *
  *   - SEED: candidate pieces are all length-1..`maxLen` substrings of
  *     corpus words, occurrence-counted weighted by word frequency; keep
  *     the top `seedTopK` by (count DESC, piece ASC) plus ALL single
  *     characters (coverage: every word stays segmentable).
  *   - COSTS: piece cost is the add-one-smoothed negative log
  *     probability in integer micro-nats — floor(ln((total + |P|) /
  *     (cnt + 1)) · 1e6 + 0.5). Counts and totals are exact longs; the
  *     one IEEE ln is floored to an integer before any comparison (the
  *     q_retrieval_ql discipline).
  *   - E-STEP: each vocab word's best segmentation minimizes
  *     (Σ piece costs, bracketed repr) lexicographically — the repr
  *     tiebreak makes the argmin TOTAL (two distinct bracketings of the
  *     same prefix always differ at a position with different
  *     characters, never by prefix, so the order is compositional and
  *     the Viterbi DP's per-position winner extends to the global one).
  *   - M-STEP: piece usage counts from the best segmentations (explode →
  *     hash-agg, freq-weighted).
  *   - PRUNE (Kudo's vocabulary shrinking, count form): keep the top
  *     `keepK` pieces by (usage DESC, piece ASC) plus all single chars
  *     (zero-usage singles survive at smoothed cost), then run the
  *     second EM round with re-estimated costs.
  *
  * Scale shape (the reason this trains at 100 TB): the corpus is scanned
  * ONCE into the Zipf-small (word, freq) vocabulary — every EM round
  * runs over that table, never the corpus (the [[Bpe]] posture). The
  * piece table is bounded by construction (seedTopK + alphabet ≤ ~75
  * rows), so it rides into the segmentation DP as a broadcast map
  * literal and the E-step is a PURE PROJECTION over the vocab table —
  * one codegen'd `aggregate` HOF per word, linear in word length, no
  * shuffle, no UDF. Driver state is the bounded piece list per round
  * (the kmeans/BPE bounded-argmax precedent).
  */
object Unigram {

  /** One vocabulary piece: substring, count backing its cost (seed count
    * in round 1, usage count after), and its integer micro-nat cost.
    */
  final case class Piece(piece: String, cnt: Long, costMicro: Long)

  /** (word, freq) corpus vocabulary — same [a-z]+ lowercase tokenization
    * as [[Bpe.vocab]]; the ONLY corpus scan in training.
    */
  def vocabWords(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Substring occurrence counts (piece, cnt) over the vocab: every
    * length-1..maxLen substring of every word, one count per occurrence
    * position, weighted by word freq. `least` guards the inner sequence
    * from going descending on words shorter than maxLen (Spark's
    * sequence(1, 0) is [1, 0], not empty — the [[Bpe.pairCounts]]
    * lesson).
    */
  def substringCounts(words: DataFrame, maxLen: Int): DataFrame =
    words
      .select(col("freq"), explode(expr(
        s"flatten(transform(sequence(1, least($maxLen, length(word)))," +
          " l -> transform(sequence(1, length(word) - l + 1)," +
          " i -> substring(word, i, l))))")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Seed piece set: top-K substrings by (cnt DESC, piece ASC) UNION all
    * single-character pieces (identical rows — same count source — so
    * the distinct dedups exactly).
    */
  def seedPieces(words: DataFrame, maxLen: Int, topK: Int): DataFrame = {
    val sc = substringCounts(words, maxLen).localCheckpoint(false)
    sc.orderBy(col("cnt").desc, col("piece").asc).limit(topK)
      .unionByName(sc.filter(length(col("piece")) === 1))
      .distinct()
  }

  /** Add-one-smoothed integer micro-nat costs from exact counts. The
    * smoothing keeps zero-usage singles finite after pruning; division
    * and ln are the one IEEE step, floored to a long before any
    * comparison.
    */
  def withCosts(pieces: Seq[(String, Long)]): Seq[Piece] = {
    val total = pieces.map(_._2).sum
    val np = pieces.size
    pieces.map { case (p, c) =>
      Piece(p, c,
        math.floor(math.log((total + np).toDouble / (c + 1).toDouble)
          * 1e6 + 0.5).toLong)
    }
  }

  /** Viterbi best segmentation of every word under `pieces` — ONE
    * `aggregate` HOF walking positions 1..len(word): dp[j] = min over
    * piece lengths l of (dp[j-l].cost + cost(word[j-l+1..j]),
    * dp[j-l].repr + '[piece]'), struct-min = (cost ASC, repr ASC), the
    * total order the oracle's exhaustive enumeration minimizes too.
    * try_element_at misses → NULL → array_min skips the candidate;
    * single-char coverage guarantees one candidate always survives.
    * Returns (word, freq, cost_micro, n_pieces, pieces).
    */
  def segment(words: DataFrame, pieces: Seq[Piece], maxLen: Int)
      : DataFrame = {
    require(pieces.nonEmpty, "empty piece set")
    // Pieces are [a-z]+ by construction — SQL-safe literals.
    val mapSql = pieces.sortBy(_.piece)
      .map(p => s"'${p.piece}', ${p.costMicro}L")
      .mkString("map(", ", ", ")")
    val dp =
      s"""aggregate(
         |  sequence(1, length(word)),
         |  array(named_struct('cost', 0L, 'repr', '')),
         |  (acc, j) -> array_append(acc, array_min(
         |    transform(sequence(1, $maxLen), l ->
         |      CASE WHEN l <= j AND try_element_at(pm,
         |          substring(word, j - l + 1, l)) IS NOT NULL
         |        THEN named_struct(
         |          'cost', acc[j - l].cost +
         |            try_element_at(pm, substring(word, j - l + 1, l)),
         |          'repr', concat(acc[j - l].repr,
         |            '[', substring(word, j - l + 1, l), ']'))
         |        ELSE CAST(NULL AS STRUCT<cost: BIGINT, repr: STRING>)
         |      END))),
         |  acc -> element_at(acc, -1))""".stripMargin
    words.withColumn("pm", expr(mapSql))
      .withColumn("best", expr(dp))
      .select(col("word"), col("freq").cast("long").as("freq"),
        col("best.cost").as("cost_micro"),
        size(split(trim(col("best.repr"), "[]"), "\\]\\["))
          .cast("long").as("n_pieces"),
        col("best.repr").as("pieces"))
  }

  /** M-step: freq-weighted piece usage counts over a [[segment]] table. */
  def usageCounts(seg: DataFrame): DataFrame =
    seg
      .select(col("freq"),
        explode(split(trim(col("pieces"), "[]"), "\\]\\[")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Two hard-EM rounds: seed → E1 → M1 → prune → E2. Returns the final
    * piece table (round-2 costs, round-2 usage counts — zero for
    * retained-but-unused singles) and the final segmentation.
    */
  def train(docs: DataFrame, textCol: String, maxLen: Int = 4,
      seedTopK: Int = 48, keepK: Int = 32): (Seq[Piece], DataFrame) = {
    require(maxLen >= 1 && seedTopK >= 1 && keepK >= 1,
      s"bad dials: maxLen=$maxLen seedTopK=$seedTopK keepK=$keepK")
    val words = vocabWords(docs, textCol).localCheckpoint(false)
    // Bounded collects throughout: |seed| <= seedTopK + alphabet, and
    // every later piece set only shrinks.
    val seed = seedPieces(words, maxLen, seedTopK).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // Degenerate corpus (no [a-z]+ words at all): an empty tokenizer and
    // an empty, schema-correct segmentation — never a throw (the
    // EmptyInputSpec contract; mirrors Bpe.learnMerges' early exhaust).
    if (seed.isEmpty)
      return (Seq.empty, words.select(col("word"),
        col("freq").cast("long").as("freq"), lit(0L).as("cost_micro"),
        lit(0L).as("n_pieces"), lit("").as("pieces")).where(lit(false)))
    val p1 = withCosts(seed)
    val use1 = usageCounts(segment(words, p1, maxLen))
      .localCheckpoint(false)
    val top2 = use1.orderBy(col("cnt").desc, col("piece").asc).limit(keepK)
    // Coverage floor: every single char survives the prune, at its
    // round-1 usage (0 if unused — the smoothed cost keeps it finite).
    val singles = use1.sparkSession
      .createDataFrame(use1.sparkSession.sparkContext.parallelize(
        seed.filter(_._1.length == 1).map(p =>
          org.apache.spark.sql.Row(p._1)), 1),
        new org.apache.spark.sql.types.StructType().add("piece", "string"))
      .join(use1, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val p2counts = top2.unionByName(singles).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val p2 = withCosts(p2counts)
    val seg2 = segment(words, p2, maxLen)
    (p2, seg2)
  }
}
