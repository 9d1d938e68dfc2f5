package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library for the documents table (north-star
  * extension: language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is built-in Catalyst expressions (split / HOFs / regex /
  * md5) — codegen'd, no UDFs, so the scan → projection pipeline stays inside
  * whole-stage codegen and scales linearly with no shuffle at all. The only
  * shuffling text operator is SimHash (one explode + hash-agg, see
  * [[simhashAggs]]).
  */
object Text {

  /** Whitespace tokens (fixture text is single-space separated). */
  def tokens(c: Column): Column = split(c, " ")

  def nTokens(c: Column): Column = size(tokens(c)).cast("long")

  def nDistinctTokens(c: Column): Column =
    size(array_distinct(tokens(c))).cast("long")

  /** BPE-ish regex token count: alnum runs, the cheap proxy for subword
    * token budgeting. RE2-safe pattern (works in DuckDB too).
    */
  def nRegexTokens(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z0-9]+"), lit(0))).cast("long")

  /** Mean token length = non-space chars / tokens. */
  def avgTokenLen(c: Column): Column =
    round(length(regexp_replace(c, " ", "")).cast("double") / nTokens(c), 4)

  /** Count of tokens in a stopword set (array HOF, no explode). */
  def stopwordCount(c: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(stopwords))).cast("long")

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small; deterministic.
    */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** Language-ID: argmax of stopword hits, first-listed language wins ties
    * (so the result is deterministic).
    */
  def langId(c: Column): Column = {
    val scores = StopwordSets.map { case (lang, words) =>
      lang -> stopwordCount(c, words)
    }
    scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) { case ((bestL, bestS), (l, s)) =>
        (when(s > bestS, lit(l)).otherwise(bestL),
          when(s > bestS, s).otherwise(bestS))
    }._1
  }

  /** Quality score ∈ [0,1]: length, stopword density, lexical diversity.
    * Fixed weights; rounded for oracle stability.
    */
  def qualityScore(c: Column): Column = {
    val nt = nTokens(c).cast("double")
    val stopRatio = stopwordCount(c, StopwordSets.head._2).cast("double") / nt
    val diversity = nDistinctTokens(c).cast("double") / nt
    round(
      lit(0.5) * least(nt / 50.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 10.0, lit(1.0)) +
      lit(0.2) * diversity, 4)
  }

  /** Document fingerprint: md5 of whitespace-normalized text — the exact-
    * dedup key (at 100 TB: group/join on the 32-char hash, never the body).
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(trim(c), "\\s+", " ").cast("binary"))

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): over an array of k-gram hashes, keep the minimum of every
    * sliding window of `w` consecutive hashes, deduplicated. Guarantee: any
    * substring match spanning ≥ w+k-1 tokens contributes at least one
    * SHARED selected fingerprint, at ~2/(w+1) selection density — so corpus
    * containment joins on the (small) fingerprint set, never the text.
    * Pure per-doc projection: zero shuffle; md5-based gram hashes keep the
    * selection engine-portable. Short docs (< w hashes) keep their single
    * minimum hash.
    */
  def winnow(hashes: Column, w: Int): Column = {
    val nh = size(hashes)
    array_distinct(
      when(nh >= w,
        transform(sequence(lit(1), nh - (w - 1)),
          i => array_min(slice(hashes, i, lit(w)))))
        .otherwise(array(array_min(hashes))))
  }

  /** Email/phone detection patterns — RE2-safe so the DuckDB oracle runs the
    * identical regex. The phone pattern is the 555-prefixed test range.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** PII redaction: emails then phones → typed placeholder tokens. One
    * codegen'd projection — the scrub pass a training pipeline runs over
    * every document, so it must not shuffle and must not leave codegen.
    */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** SimHash over `positions` bit positions: majority vote of the top bit of
    * hex nibble p of the per-token md5 (positions ≤ 32 read md5(tok),
    * positions 33-64 read md5("x:" ++ tok) — two hashes give 64 independent
    * bits). Returns the aggregate expressions to apply after exploding
    * tokens — one hash-agg shuffle keyed by doc id.
    *
    * 64 positions (not 16): with 4 LSH bands the band key is then 16 bits,
    * so bucket cardinality is ~2^16 and the banded self-join stays a real
    * LSH join instead of degenerating to all-pairs (16-bit signatures give
    * only 16 distinct values per 4-bit band — O(n²/64) in disguise).
    */
  /** The two per-token hashes feeding [[simhashAggs]] — project these ONCE
    * per token row before aggregating: 64 aggregate expressions each
    * recomputing md5 would do 64 digests/row instead of 2.
    */
  def simhashHashes(tokenCol: Column): (Column, Column) =
    (md5(tokenCol.cast("binary")),
      md5(concat(lit("x:"), tokenCol).cast("binary")))

  /** The 8 long "quarters" of the two per-token md5s (8 hex nibbles each),
    * named q0..q7 — project these ONCE per token row alongside the id:
    * referencing the conv() inside each aggregate input would duplicate it
    * into every one of its 8 consumers (the md5-per-agg trap all over
    * again).
    */
  def simhashQuarters(ha: Column, hb: Column): Seq[Column] = {
    def quarter(h: Column, i: Int): Column =
      conv(substring(h, i * 8 + 1, 8), 16, 10).cast("long")
    ((0 until 4).map(quarter(ha, _)) ++ (0 until 4).map(quarter(hb, _)))
      .zipWithIndex.map { case (c, i) => c.as(s"q$i") }
  }

  /** Aggregates over the pre-projected quarter columns q0..q7 (positions
    * 1-32 from q0-q3 = md5(tok), 33-64 from q4-q7 = md5("x:"++tok)). Bit p
    * is the top bit of hex nibble p; each vote is a shift-and-mask
    * (±1 = 2·bit − 1) — codegen'd integer arithmetic instead of a per-row
    * string compare. Bit-identical to the substring form (the DuckDB
    * oracle keeps using that form).
    */
  def simhashAggs(positions: Int): Seq[Column] =
    (1 to positions).map { p =>
      val off = if (p <= 32) p else p - 32 // nibble index within its hash
      val q = col(s"q${(if (p <= 32) 0 else 4) + (off - 1) / 8}")
      val shift = 4 * (7 - (off - 1) % 8) + 3 // top bit of that nibble
      sum(shiftright(q, shift).bitwiseAND(1) * 2 - 1).as(s"b$p")
    }

  /** Assemble the simhash signature string from the [[simhashAggs]] sums. */
  def simhashSignature(positions: Int = 64): Column =
    concat((1 to positions).map(p =>
      when(col(s"b$p") > 0, "1").otherwise("0")): _*)
}
