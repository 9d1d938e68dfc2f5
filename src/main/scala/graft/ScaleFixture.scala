package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consistent F× replication of the WHOLE fixture star (every table, FK
  * chains preserved), used by [[ScaleSuite]] to measure the full registry
  * at 10× the bench scale ("sf1") and by ScaleFixtureSpec.
  *
  * Design goals, in order:
  *
  *  1. FK-consistent growth. Every key that participates in a join chain
  *     shifts by the same replica offset on both sides, so join
  *     cardinalities grow linearly (orders ×F, each order still joins its
  *     own lineitems). `region`/`nation` stay fixed — they are bounded
  *     catalogs in TPC-H and in any real warehouse.
  *  2. Realistic duplicate structure. Verbatim replication would make
  *     every document 10× exactly-duplicated and every embedding 10×
  *     repeated, so LSH/minhash candidate volume and SemDeDup cell pairs
  *     would grow ×F² BY FIXTURE CONSTRUCTION — a measurement artifact,
  *     not an engine property (a real 10× crawl has ~10× the duplicate
  *     clusters, not 10×-bigger clusters). Replica r>0 therefore gets:
  *       - `documents.text` passed through a per-replica character
  *         substitution (`translate` applying the r-th power of a fixed
  *         26-cycle over the lowercase alphabet). Length, token
  *         boundaries, and within-replica duplicate/near-dup structure
  *         are preserved exactly; cross-replica shingle overlap drops
  *         to ~0.
  *       - `embeddings.embedding` rotated by r positions. Norms and
  *         within-replica cosine geometry are preserved exactly;
  *         cross-replica alignment is broken.
  *     Replica 0 is always byte-identical to the base fixture.
  *  3. Predicate compatibility. The offset is a multiple of 25 and 100
  *     (same contract as ScaleBench), so the registry's modular
  *     predicates (`vec_id % 25 === 0` query sets) select in every
  *     replica, while absolute predicates (`vec_id < 10` centroid sets)
  *     deliberately stay fixture-sized — the fixed-dial behavior the
  *     scale ledger exists to expose.
  */
object ScaleFixture {

  /** > any fixture id (sf0.1 max is o_orderkey=149,999); multiple of 25
    * and 100 so modular query-set predicates keep their meaning.
    */
  val Offset = 1000000L

  /** Per-table long id columns that shift by `replica * Offset`. Both
    * sides of every FK chain appear, keyed consistently.
    */
  val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "region" -> Seq.empty,
    "nation" -> Seq.empty,
  )

  /** All 26 lowercase letters in frequency order, treated as one 26-cycle:
    * replica r substitutes each letter for the one r positions later
    * (cyclically), i.e. applies the r-th power of the cycle. Powers of a
    * full-length cycle are fixed-point-free for r ≢ 0 (mod 26), so EVERY
    * letter changes between any two distinct replicas — bijective per
    * replica (length and token structure untouched, within-replica
    * duplicate/near-dup geometry preserved exactly) while cross-replica
    * shingle overlap drops to ~0. The full alphabet (vs the r12 10-letter
    * subset) raises the clean replication ceiling from 10× to 26×, which
    * is what lets the scale ledger measure the second decade.
    */
  private val SubstAlphabet = "etaoinshrdlcumwfgypbvkjxqz"

  private def perturb(table: String, df: DataFrame, r: Int): DataFrame =
    table match {
      case _ if r == 0 => df
      case "documents" =>
        // Replicas 0..25: the r-th power of the 26-cycle (fixed-point-
        // free pairwise). A pairwise-everywhere-different permutation
        // family on 26 letters caps at 26 rows (each position must take
        // 26 distinct values across rows — a Latin-square column), so
        // blocks beyond the first compose the same cycle powers with a
        // per-word POSITION bijection: block 1 reverses each word,
        // block 2 swaps its first two characters, block 3 rotates it by
        // two characters. Cross-block word coincidences (t1(w) equal to
        // some cycle power of t2(w)) were verified exhaustively over the
        // fixture's 31-word vocabulary × all 26 relative powers × all
        // transform pairs: the only coinciding words are 'a' (length-1 —
        // invariant under every position bijection, at equal powers) and
        // 'agg' (whose swap01 and rot2 images are both the palindrome
        // 'gag', so blocks 2↔3 coincide on it at equal powers). The
        // corpus's longest consecutive run of {a, agg} is 4 < the
        // 5-token shingle at every SF — so no 5-gram shingle, no
        // whole-doc fingerprint, and no ≥20-token substring span can
        // ever coincide across replicas, raising the clean-replication
        // ceiling from 26× (one block) through 52× (reversal, r15) to
        // 104× (the four-block family, r17). Every transform is a
        // bijection on [a-z]+ words applied uniformly, so within-replica
        // duplicate/near-dup geometry, tokenization, lengths, and
        // whitespace structure are all preserved exactly.
        val k = r % SubstAlphabet.length
        val to = SubstAlphabet.drop(k) + SubstAlphabet.take(k)
        val subbed =
          df.withColumn("text", translate(col("text"), SubstAlphabet, to))
        def mapWords(f: Column => Column) = subbed.withColumn("text",
          array_join(transform(split(col("text"), " "), f), " "))
        r / SubstAlphabet.length match {
          case 0 => subbed
          case 1 => mapWords(w => reverse(w))
          case 2 => mapWords(w => when(length(w) >= 2,
              concat(substring(w, 2, 1), substring(w, 1, 1),
                substring(w, 3, 1000000))).otherwise(w))
          case _ => mapWords(w => when(length(w) >= 2,
              concat(substring(w, 3, 1000000), substring(w, 1, 2)))
            .otherwise(w))
        }
      case "customer" =>
        // Pairwise-similarity queries (Fellegi-Sunter ER) block on name
        // variants and balance bands: verbatim replicas put F copies of
        // every name and balance in each block, growing candidate sets
        // ×F² BY CONSTRUCTION — a real F× customer base has F× the
        // distinct names, not F-fold name multiplicity. Regenerate the
        // name from the already-shifted key (the key↔name invariant the
        // base rows carry: "Customer#%09d") and lift each replica's
        // balances far past every pairwise tolerance (±100), so
        // within-replica match structure is preserved exactly and
        // cross-replica candidates vanish.
        df.withColumn("c_name", concat(lit("Customer#"),
            lpad(col("c_custkey").cast("string"), 9, "0")))
          .withColumn("c_acctbal", col("c_acctbal") + lit(r * 100000.0))
      case "embeddings" =>
        // Cyclic rotation by r mod dim, NEGATED once r wraps past the
        // dimension: negation preserves norms and every within-replica
        // cosine/dot exactly (⟨−x,−y⟩ = ⟨x,y⟩) while a cross-wrap pair's
        // cosine is the NEGATIVE of its rotated value — a same-rotation
        // pair (r, r+dim) reads exactly −1, so no near-dup threshold or
        // max-dot top-k can ever select a cross-replica twin. This lifts
        // the embedding ceiling from dim× to 2·dim× (128× at the
        // fixture's 64 dims), matching the documents family's 104.
        // An over-long slice length returns "to the end", so size(e)
        // keeps this dimension-agnostic. Never pass Int.MaxValue as the
        // length — slice's start+length overflows and downstream HOFs
        // (aggregate) silently read a corrupted array (observed on
        // Spark 4.1.2: the fold returned last-element² only).
        val e = col("embedding")
        val d = size(e)
        val k = pmod(lit(r), d)
        val rot = concat(slice(e, k + lit(1), d), slice(e, lit(1), k))
        df.withColumn("embedding",
          when(lit(r) < d, rot).otherwise(transform(rot, x => -x)))
      case _ => df
    }

  /** One table, F replicas, ids shifted and content perturbed per the
    * rules above. Exposed (not just `build`) so the spec can assert the
    * invariants frame-to-frame.
    */
  def replicateTable(spark: SparkSession, srcDir: String, table: String,
      factor: Int): DataFrame = {
    // Beyond 4×|SubstAlphabet| replicas the (cycle power, word bijection)
    // perturbation key wraps and replicas 104 apart become byte-identical
    // text — the F² duplicate artifact this fixture exists to avoid
    // would silently return and the scale ledger would blame the engine
    // for it. Fail loudly instead.
    require(factor <= 4 * SubstAlphabet.length,
      s"factor $factor > ${4 * SubstAlphabet.length}: the per-replica " +
        "(substitution × word-bijection) perturbation family would wrap " +
        "and reintroduce quadratic duplicate structure; compose another " +
        "orthogonal bijection to go bigger")
    val src = spark.read.parquet(s"$srcDir/$table.parquet")
    // An embedding (rotation, sign) key at r >= 2·dim aliases back to
    // replica r − 2·dim and would quietly reintroduce cross-replica
    // duplicate vectors. One head probe at fixture-build time (never per
    // row, never in a query path).
    if (table == "embeddings" && factor > 1) {
      val head = src.select(size(col("embedding")).as("d")).head(1)
      head.headOption.foreach { row =>
        val dim = row.getInt(0)
        require(factor <= 2 * dim,
          s"factor $factor > 2x embedding dim $dim: the replica " +
            "(rotation, sign) key would wrap and reintroduce " +
            "cross-replica duplicate vectors")
      }
    }
    val cols = shiftCols.getOrElse(table,
      sys.error(s"no replication rule for table $table"))
    if (cols.isEmpty || factor == 1) src
    else {
      // An id at/above the offset would collide with a replica's range and
      // silently corrupt every join-growth measurement downstream.
      val maxExprs = cols.map(c => max(col(c)).as(c))
      val maxRow = src.agg(maxExprs.head, maxExprs.tail: _*).head()
      cols.zipWithIndex.foreach { case (c, i) =>
        // agg(max) on an EMPTY table yields one null row: an empty source
        // trivially satisfies the collision guard (nothing to collide).
        if (!maxRow.isNullAt(i)) {
          val m = maxRow.getLong(i)
          require(m < Offset, s"$table.$c max $m >= offset $Offset")
        }
      }
      (0 until factor).map { r =>
        val shifted = cols.foldLeft(src)((d, c) =>
          d.withColumn(c, col(c) + lit(r * Offset)))
        perturb(table, shifted, r)
      }.reduce(_.unionAll(_))
    }
  }

  /** Materialize all tables at `factor`× under `outDir`, once: a marker
    * file records the built factor and short-circuits rebuilds (delete
    * the directory to force).
    */
  def build(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val marker = java.nio.file.Paths.get(outDir, "_BUILT")
    if (java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker)).trim ==
          s"$factor:$srcDir") return
    shiftCols.keys.toSeq.sorted.foreach { table =>
      replicateTable(spark, srcDir, table, factor)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }
    java.nio.file.Files.write(marker,
      s"$factor:$srcDir\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
