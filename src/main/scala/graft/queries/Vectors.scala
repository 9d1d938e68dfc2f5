package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Similarity search over the embeddings fixture (north star: ANN over an
  * Array[Float] column) as driver-checkable (Spark, DuckDB-SQL) pairs.
  *
  * The DuckDB twins compute the dot product as the SAME sequential
  * left-fold Spark's `aggregate` HOF performs (list_reduce over per-index
  * products), so double arithmetic is bit-identical on both sides and the
  * round(…, 6) columns compare exactly.
  *
  * Scale notes: brute force broadcasts the (small) query set and streams
  * the corpus — O(queries × corpus), the correctness baseline and the
  * verify pass on ANN candidates. IVF assigns clusters with a zero-shuffle
  * argmax over broadcast centroids and probes only the query's cluster.
  * Norms are computed once per row, never per pair.
  */
object Vectors {

  /** The benchmark query workload: every 25th BASE-fixture vector. The id
    * cap pins the set to the base fixture's id range ([[graft.ScaleFixture]]
    * shifts replica ids by +r·Offset), so in the scale ledger the corpus
    * grows while the query workload stays fixed — the serving cost model
    * (O(corpus × |queries|), |queries| bounded) instead of the fixture
    * artifact where BOTH sides grow and every brute/ADC baseline turns
    * quadratic in the replication factor (the r12 ledger's 10–12× sim
    * rows). A no-op on every real sf dir (max vec_id 1999 < Offset), so
    * oracle rows are unchanged at every verify scale; the SQL twins carry
    * the same cap literally.
    */
  private val querySet: Column =
    col("vec_id") % 25 === 0 && col("vec_id") < graft.ScaleFixture.Offset

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact brute-force cosine top-5 for every 25th vector as query.
    "q_sim_topk_brute" -> ((s, dir) =>
      Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id",
        "embedding", querySet, k = 5)),

    // Greedy k-center coreset (Gonzalez 1985 farthest-first; Sener &
    // Savarese 2018): 10 selections, each round ONE corpus pass against
    // the ≤k broadcast selected vectors then a TakeOrdered argmax —
    // O(n·k) total, no pairwise n². The selection trace doubles as the
    // coverage-radius curve.
    "q_coreset_kcenter" -> ((s, dir) =>
      Similarity.kCenterCoreset(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 10)),

    // Mean-reciprocal-rank inputs: each query's first same-label
    // neighbor inside the brute top-20 (label = graded relevance, the
    // q_hard_negatives convention); rank is exact, rr is one IEEE
    // division. Queries with no relevant neighbor in the window report
    // rank 0 / rr 0 — kept via the left join, never dropped.
    "q_sim_mrr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val topk = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        querySet, k = 20)
      val labels = emb.select(col("vec_id"), col("label"))
      val hits = topk
        .join(labels.select(col("vec_id").as("query_id"),
          col("label").as("q_label")), Seq("query_id"))
        .join(labels.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label")), Seq("neighbor_id"))
        .filter(col("q_label") === col("n_label"))
        .groupBy(col("query_id"))
        .agg(min(col("rank")).as("fh"))
      topk.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("fh"), lit(0L)).as("first_hit_rank"),
          round(when(col("fh").isNotNull, lit(1.0) / col("fh"))
            .otherwise(lit(0.0)), 6).as("rr"))
    }),

    // All-pairs cosine near-dups ≥ 0.35 (fixture max sim ≈ 0.51) —
    // quadratic verify-pass baseline.
    "q_sim_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", 0.35)),

    // IVF ANN: vectors 0-9 as centroids, every 25th vector as query, top-5
    // within the query's cluster only.
    "q_sim_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, querySet, k = 5)),

    // Multi-probe IVF (nprobe=2): queries near a cluster boundary also
    // search their second-nearest cluster — higher recall, probe fan-out
    // bounded by |queries|×nprobe.
    "q_sim_ivf_probe2" -> ((s, dir) =>
      Similarity.ivfTopKProbe(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, querySet, k = 5, nprobe = 2)),

    // ANN quality evaluation: recall@5 of single-probe IVF against the
    // brute-force ground truth, per query — the metric that decides
    // whether an index is shippable. Both sides come from the library
    // functions themselves, so the measurement exercises the real paths.
    "q_sim_recall" -> ((s, dir) => {
      // ONE normalized corpus feeds both the brute ground truth and the IVF
      // side — materialized up front because exchange reuse does not fire
      // across the two differently-shaped consumers (same pattern as the
      // minhash family; localCheckpoint is the single-JVM stand-in for
      // persist). Halves the scan+norm work vs building each side from raw.
      val corpus = Similarity.withNorm(t(s, dir, "embeddings"), "vec_id",
        "embedding").localCheckpoint()
      val brute = Similarity.bruteForceTopKFrom(corpus, "vec_id",
        querySet, k = 5)
      val ivf = Similarity.ivfTopKFrom(
        Similarity.assignClustersFrom(corpus, "vec_id", col("vec_id") < 10),
        "vec_id", querySet, k = 5)
      brute.select(col("query_id"), col("neighbor_id"))
        .join(ivf.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .select(col("query_id"), col("n_true"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true"), 4)
            .as("recall_at_5"))
    }),

    // Johnson-Lindenstrauss random projection (Achlioptas ±1 signs from
    // a pure (i, j) hash — no RNG, no stored matrix) down to 16 dims,
    // then exact cosine top-5 in the projected space: the published
    // dimensionality-reduction lever for ANN candidate generation.
    // Micro-unit integer inputs make every projected coordinate an
    // order-free integer sum; the projected table is long-format
    // (id, j, y) — the shape that ships at scale.
    // r19: the projected table is localCheckpointed — longFormatTopK
    // consumes it from THREE subtrees (norms, the query rows, the dot-
    // product probe), and without materialization each re-ran the whole
    // explode+sign+agg projection (guide §5: persist when reuse beats
    // recompute; the table is n·outDim longs — tiny).
    "q_sim_rp_topk" -> ((s, dir) =>
      Similarity.longFormatTopK(
        Similarity.randomProjection(t(s, dir, "embeddings"), "vec_id",
          "embedding", outDim = 16).localCheckpoint(),
        "vec_id", querySet, k = 5)),

    // The JL audit: recall@5 of the 16-dim projected ranking against the
    // full-dimension brute-force ground truth — the number that decides
    // whether the 4× shrink is usable as a candidate stage. On THIS
    // fixture the verdict is no (mean ~0.13; ~0.36 even at 48 dims): the
    // synthetic embeddings have near-uniform pairwise cosines, so JL's
    // relative-distance guarantee preserves almost nothing of the
    // ranking — exactly the corpus pathology the audit exists to catch
    // before a projection ships.
    "q_sim_rp_recall" -> ((s, dir) => {
      val brute = Similarity.bruteForceTopK(t(s, dir, "embeddings"),
        "vec_id", "embedding", querySet, k = 5)
      val rp = Similarity.longFormatTopK(
        Similarity.randomProjection(t(s, dir, "embeddings"), "vec_id",
          "embedding", outDim = 16).localCheckpoint(), // r19: see rp_topk
        "vec_id", querySet, k = 5)
      brute.select(col("query_id"), col("neighbor_id"))
        .join(rp.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .select(col("query_id"), col("n_true"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true"), 4)
            .as("recall_at_5"))
    }),

    // 1-bit (sign) quantized top-k: every vector collapses to two 32-bit
    // words, ranking is XOR+popcount Hamming (Similarity.signSignature /
    // binaryHammingTopK) — the 32×-memory coarse rung of the
    // quantization ladder, the first-stage filter whose candidates the
    // exact ladder re-ranks. The oracle computes the SAME Hamming count
    // WITHOUT packing (per-dimension sign mismatches over the float
    // lists), so a green row proves the bit packing lossless.
    "q_sim_binary_topk" -> ((s, dir) =>
      Similarity.binaryHammingTopK(t(s, dir, "embeddings"), "vec_id",
        "embedding", querySet, k = 5)),

    // The binary-quantization audit: recall@5 of the Hamming ranking
    // against exact-cosine ground truth — the number that prices the
    // 32× memory saving (same report shape as q_sim_rp_recall).
    "q_sim_binary_recall" -> ((s, dir) => {
      val brute = Similarity.bruteForceTopK(t(s, dir, "embeddings"),
        "vec_id", "embedding", querySet, k = 5)
      val bin = Similarity.binaryHammingTopK(t(s, dir, "embeddings"),
        "vec_id", "embedding", querySet, k = 5)
      brute.select(col("query_id"), col("neighbor_id"))
        .join(bin.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .select(col("query_id"), col("n_true"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true"), 4)
            .as("recall_at_5"))
    }),

    // Per-vector element statistics via array HOFs — one codegen'd
    // projection, no explode, no shuffle.
    "q_vector_stats" -> ((s, dir) => {
      val v = Similarity.asDouble(col("embedding"))
      t(s, dir, "embeddings").select(
        col("vec_id"),
        round(array_min(v), 6).as("v_min"),
        round(array_max(v), 6).as("v_max"),
        round(aggregate(v, lit(0.0), (a, x) => a + x) / size(v), 6)
          .as("v_mean"),
        round(Similarity.l2norm(v), 6).as("v_norm"))
    }),

    // IVF index building: one k-means refinement step over the seed
    // assignment — per-(cluster, dim) means in long format, no vector
    // collects.
    "q_sim_kmeans_step" -> ((s, dir) =>
      Similarity.centroidRefinement(
        Similarity.assignClusters(t(s, dir, "embeddings"), "vec_id",
          "embedding", col("vec_id") < 10),
        "cluster_id", "v")),

    // The full Lloyd TRAINING loop the single step above exists for —
    // and the trainer the PQ codebook doc points at: 3 rounds of
    // broadcast-argmax assignment + per-(cluster, dim) rounded-mean
    // refinement, centroids rebuilt distributedly between rounds
    // (Similarity.kMeansTrain). Round-6 state makes every round
    // bit-identical across engines, so the unrolled 3-round SQL twin
    // (MATERIALIZED per the q_coreset_kcenter lesson) hash-matches the
    // final centroid table exactly.
    "q_sim_kmeans" -> ((s, dir) =>
      Similarity.kMeansTrain(
        Similarity.withNorm(t(s, dir, "embeddings"), "vec_id", "embedding"),
        "vec_id", col("vec_id") < 10, rounds = 3)),

    // The NARROW demo dial (16 planes, 4 bands × 4 bits) kept under the
    // oracle as the dial-sensitivity baseline: 4-bit bands have a
    // quadratic random-collision floor (bands/2^bits of ALL pairs — 46×
    // growth at factor 26 vs the default dial's 5×), which is exactly
    // why band width must grow ~log₂(n). Deliberately NOT the default
    // name: a reader copying the default gets the scale-safe dial below.
    "q_sim_neardup_lsh16" -> ((s, dir) =>
      Similarity.cosineLshPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64, threshold = 0.35)),

    // Int8-quantized brute-force top-k: the 4× memory lever measured under
    // the oracle — cosine is scale-invariant, so the quantized index is
    // just the int-valued vectors through the SAME top-k machinery. The
    // twin reproduces the exact codes (explicit floor(x/s + .5) rounding).
    "q_sim_quant_topk" -> ((s, dir) =>
      Similarity.bruteForceTopKFrom(
        Similarity.quantizeInt8(t(s, dir, "embeddings"), "vec_id",
          "embedding"),
        "vec_id", querySet, k = 5)),

    // SemDeDup (semantic dedup): cluster-confine the quadratic — nearest
    // broadcast centroid per vector, within-cluster cosine ≥ 0.3 pairs,
    // drop the higher id of each pair; per-cluster kept/dropped report.
    // Centroid count is the cell-size dial that keeps Σ|cell|² linear-ish
    // at corpus scale; cross-cluster dups missed by design (the published
    // recall tradeoff).
    "q_semdedup" -> ((s, dir) =>
      Similarity.semanticDedupReport(t(s, dir, "embeddings"), "vec_id",
        "embedding", col("vec_id") < 10, threshold = 0.3)),

    // SemDeDup, corpus-scaled centroid dial: every 100th vector is a
    // centroid, so the centroid count grows WITH the corpus and expected
    // cell size stays ~100 regardless of scale — Σ|cell|² (the pair-join
    // input) grows linearly where q_semdedup's fixed 10 centroids grow it
    // quadratically (both dials measured in ScaleBench; BENCH_SF1 shows
    // the full-suite consequence). Assignment is still one broadcast
    // argmax — O(n·k) flops; at extreme scale k itself gets a coarse
    // two-level quantizer, which changes the constant, not this shape.
    "q_semdedup_scaled" -> ((s, dir) =>
      Similarity.semanticDedupReport(t(s, dir, "embeddings"), "vec_id",
        "embedding", col("vec_id") % 100 === 0, threshold = 0.3)),

    // Semantic decontamination: the embedding-space sweep the n-gram
    // decontamination family can't do — a paraphrased eval doc shares no
    // 5-token shingle with its source but sits next to it in embedding
    // space. Flags every TRAIN doc (shared split hash, so this audits the
    // split the pipeline actually uses) with cosine ≥ 0.35 to ANY val/test
    // doc, reporting hit count, max similarity, and the lowest offending
    // eval id (deterministic; an argmax would tie-break on engine order).
    // Eval sets are small by construction, so the eval side broadcasts and
    // the corpus streams once through the broadcast join — O(train × eval)
    // flops with NO corpus shuffle; only flagged rows (≈ leaks, tiny)
    // reach the final aggregate's exchange (PlanSpec-pinned). Embeddings
    // are 1:1 with documents (vec_id = doc_id).
    "q_semantic_decontam" -> ((s, dir) => {
      val c = Similarity.withNorm(t(s, dir, "embeddings"), "vec_id",
        "embedding")
      val train = c.filter(splitCol(col("vec_id")) === "train")
        .select(col("vec_id").as("train_id"), col("v"), col("nrm"))
      // The eval suite is a FIXED artifact in production — the training
      // corpus grows, the benchmark does not. Pin the eval side to the
      // base-fixture id range (same rationale and no-op property as
      // [[querySet]]); the train side scales freely.
      val eval = c.filter(splitCol(col("vec_id")) =!= "train" &&
          col("vec_id") < graft.ScaleFixture.Offset)
        .select(col("vec_id").as("eval_id"), col("v").as("ev"),
          col("nrm").as("en"))
      train.crossJoin(broadcast(eval))
        .select(col("train_id"), col("eval_id"),
          round(Similarity.dot(col("v"), col("ev")) /
            (col("nrm") * col("en")), 6).as("sim"))
        .filter(col("sim") >= 0.35)
        .groupBy(col("train_id"))
        .agg(count(lit(1)).as("n_eval_hits"), max(col("sim")).as("max_sim"),
          min(col("eval_id")).as("first_eval_id"))
    }),

    // Scale path, DEFAULT dial: random-hyperplane LSH candidates (32
    // planes, 4 bands × 8 bits) verified by exact cosine — the
    // composition nearDupPairs exists to baseline. 8-bit bands keep the
    // random-collision floor 16× below the 4-bit demo dial's
    // (bands/2^bits of all pairs), measured 5.3× vs 46× growth at factor
    // 26 — the production dial leads; the narrow dial lives under the
    // `lsh16` suffix above.
    "q_sim_neardup_lsh" -> ((s, dir) =>
      Similarity.cosineLshPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64, threshold = 0.35, planes = 32)),

    // Product-quantization code table (4 subspaces × 16 dims, 16 seed
    // centroids each): the (vec_id, subspace, code) relation a PQ index
    // stores — 4 small ints instead of 64 floats. The oracle reproduces
    // every code exactly (bit-identical sequential-fold L2 + lowest-id
    // tiebreak on both engines).
    "q_sim_pq_codes" -> ((s, dir) =>
      Similarity.pqCodes(
        Similarity.withNorm(t(s, dir, "embeddings"), "vec_id", "embedding"),
        "vec_id", m = 4, ds = 16, col("vec_id") < 16)
        .select("vec_id", "j", "code")),

    // IVF+PQ composed (IVFADC): coarse cluster confinement AND PQ-coded
    // candidates, full-precision queries — the published billion-scale
    // layout, here as one oracle-checked relation. Same centroid dials as
    // q_sim_ivf (coarse) and q_sim_pq_codes (codebooks), so its recall
    // reads directly against q_sim_recall / q_sim_pq_recall.
    "q_sim_ivfpq" -> ((s, dir) =>
      Similarity.ivfPqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, col("vec_id") < 16, m = 4, ds = 16,
        querySet, k = 5)),

    // Classic IVFADC (Jégou et al. 2011 §V): PQ codes model the RESIDUAL
    // v − centroid, so each subspace codebook covers the tight
    // within-cluster displacement distribution instead of the global
    // spread — the published accuracy lever at identical memory. Codebook
    // seeds (vec_id 10..25) are DISJOINT from the coarse centroids (< 10),
    // whose own residuals are zero vectors.
    "q_sim_ivfpq_residual" -> ((s, dir) =>
      Similarity.ivfPqResidualTopK(t(s, dir, "embeddings"), "vec_id",
        "embedding", col("vec_id") < 10,
        col("vec_id") >= 10 && col("vec_id") < 26, m = 4, ds = 16,
        querySet, k = 5)),

    // Recall@5 of residual IVFADC against brute-force ground truth — sits
    // beside q_sim_pq_recall so the residual lever's gain over raw-vector
    // coding is one committed row (the spec pins residual ≥ raw IVFPQ).
    "q_sim_ivfpq_res_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = Similarity.withNorm(emb, "vec_id", "embedding")
        .localCheckpoint()
      val brute = Similarity.bruteForceTopKFrom(corpus, "vec_id",
        querySet, k = 5)
      val res = Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, col("vec_id") >= 10 && col("vec_id") < 26,
        m = 4, ds = 16, querySet, k = 5)
      brute.select(col("query_id"), col("neighbor_id"))
        .join(res.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .select(col("query_id"), col("n_true"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true"), 4)
            .as("recall_at_5"))
    }),

    // PQ ANN top-5 via asymmetric distance: full-precision queries against
    // PQ reconstructions — the published 16-32× memory lever beyond int8's
    // 4×, and it composes with IVF (the code table is just another
    // relation).
    "q_sim_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(
        Similarity.withNorm(t(s, dir, "embeddings"), "vec_id", "embedding"),
        "vec_id", m = 4, ds = 16, col("vec_id") < 16,
        querySet, k = 5)),

    // PQ quality evaluation: recall@5 of the ADC top-k against the
    // brute-force ground truth — the recall row that sits beside
    // q_sim_recall's IVF measurement, from one shared normalized corpus.
    "q_sim_pq_recall" -> ((s, dir) => {
      val corpus = Similarity.withNorm(t(s, dir, "embeddings"), "vec_id",
        "embedding").localCheckpoint()
      val brute = Similarity.bruteForceTopKFrom(corpus, "vec_id",
        querySet, k = 5)
      val pq = Similarity.pqTopK(corpus, "vec_id", m = 4, ds = 16,
        col("vec_id") < 16, querySet, k = 5)
      brute.select(col("query_id"), col("neighbor_id"))
        .join(pq.select(col("query_id"), col("neighbor_id"),
          lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .select(col("query_id"), col("n_true"), col("n_found"),
          round(col("n_found").cast("double") / col("n_true"), 4)
            .as("recall_at_5"))
    }),

    // Embedding-space anomaly detection: vectors far from their assigned
    // centroid (bottom decile of within-cluster cosine) — the
    // mislabeled/noise/garbage sweep a curation run performs on the
    // embedding table before ANN indexing or SemDeDup. Same broadcast
    // argmax assignment as IVF; the per-cluster threshold is the EXACT
    // ORDER STATISTIC at 0-indexed rank floor(0.1*(n−1)) of the
    // already-6dp-rounded csim (vec_id tiebreak) — no interpolation, so
    // both engines pick the identical stored value and the strict
    // `csim < p10` cut cannot flip on a 1-ulp interpolation difference
    // (percentile() vs quantile_cont() order their float ops
    // differently). scored feeds the threshold pick AND the flag filter
    // → one materialization.
    "q_embedding_outliers" -> ((s, dir) => {
      val corpus = Similarity.withNorm(t(s, dir, "embeddings"), "vec_id",
        "embedding").localCheckpoint()
      val asgn = Similarity.assignClustersFrom(corpus, "vec_id",
        col("vec_id") < 10)
      val cents = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("cluster_id"), col("v").as("cv"),
          col("nrm").as("cn"))
      val scored = asgn.join(broadcast(cents), Seq("cluster_id"))
        .select(col("vec_id"), col("cluster_id"),
          round(Similarity.dot(col("v"), col("cv")) /
            (col("nrm") * col("cn")), 6).as("csim"))
        .localCheckpoint()
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("csim").asc, col("vec_id").asc)
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
      val thr = scored
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") ===
          floor(lit(0.1) * (col("n") - lit(1))).cast("long") + lit(1))
        .select(col("cluster_id"), col("csim").as("p10"))
      scored.join(broadcast(thr), Seq("cluster_id"))
        .filter(col("csim") < col("p10"))
        .select("vec_id", "cluster_id", "csim", "p10")
    }),

    // Two-stage retrieval (the production PQ pattern, Jégou et al. 2011
    // §VII): ADC over reconstructions proposes top-20 CANDIDATES, then the
    // true vectors re-score just those and keep the exact top-5 — PQ's
    // memory economics for the scan, full precision for the answer. The
    // refine join touches |queries|×20 rows (the whole point); queries
    // broadcast, the candidate set joins back to the corpus by id.
    "q_sim_pq_refined" -> ((s, dir) => {
      val corpus = Similarity.withNorm(t(s, dir, "embeddings"), "vec_id",
        "embedding").localCheckpoint()
      val cand = Similarity.pqTopK(corpus, "vec_id", m = 4, ds = 16,
        col("vec_id") < 16, querySet, k = 20)
        .select(col("query_id"), col("neighbor_id"))
      val queries = corpus.filter(querySet)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      cand
        .join(corpus.select(col("vec_id").as("neighbor_id"), col("v"),
          col("nrm")), Seq("neighbor_id"))
        .join(broadcast(queries), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(Similarity.dot(col("v"), col("qv")) /
            (col("nrm") * col("qn")), 6).as("sim"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
    }),

    // Ranking-quality evaluation beside recall@5: nDCG@5 of the IVF
    // ranking against brute-force graded relevance (brute rank r ⇒
    // rel = 6−r, non-top-5 ⇒ 0). The log2 position discounts are embedded
    // as PRECOMPUTED nano-unit literal constants (floor(1e9/log2(r+1)))
    // in both engines — DCG becomes an order-independent integer sum with
    // zero transcendental drift, and nDCG is one shared division by the
    // constant ideal (IDCG@5 = Σ (6−i)·disc(i) = 10_271_924_935). Same
    // one-materialized-corpus shape as q_sim_recall.
    "q_sim_ndcg" -> ((s, dir) => {
      val corpus = Similarity.withNorm(t(s, dir, "embeddings"), "vec_id",
        "embedding").localCheckpoint()
      val brute = Similarity.bruteForceTopKFrom(corpus, "vec_id",
        querySet, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          (lit(6L) - col("rank")).as("rel"))
      val ivf = Similarity.ivfTopKFrom(
        Similarity.assignClustersFrom(corpus, "vec_id", col("vec_id") < 10),
        "vec_id", querySet, k = 5)
      val disc = when(col("rank") === 1, 1000000000L)
        .when(col("rank") === 2, 630929753L)
        .when(col("rank") === 3, 500000000L)
        .when(col("rank") === 4, 430676558L)
        .otherwise(386852807L)
      ivf.select(col("query_id"), col("neighbor_id"), col("rank"))
        .join(brute, Seq("query_id", "neighbor_id"), "left")
        .withColumn("contrib", coalesce(col("rel"), lit(0L)) * disc)
        .groupBy(col("query_id"))
        .agg(sum(col("contrib")).as("dcg_nano"),
          count(when(col("rel").isNotNull, lit(1))).as("n_rel_hits"))
        .withColumn("ndcg_at_5",
          round(col("dcg_nano") / lit(10271924935.0), 6))
    }),

    // KNN-Shapley data valuation (Jia et al. 2019, "Efficient task-
    // specific data valuation for nearest neighbor algorithms"): the
    // exact closed form for every training point's Shapley value under
    // the K-NN utility — rank the train corpus per query by cosine, then
    //   s_(n) = 1[y_(n)=y_q] / n
    //   s_(i) = s_(i+1) + (1[y_(i)=y_q] − 1[y_(i+1)=y_q]) / max(K, i)
    // which is a SUFFIX SUM of per-rank terms — one window pass, no
    // recursion. Arithmetic is exact nano-unit longs: each term is
    // d · (1e9 div max(K, i)) with d ∈ {−1, 0, 1}, multiplied AFTER the
    // positive integer division so truncation semantics never meet a
    // negative operand (Spark div truncates toward zero, DuckDB //
    // floors; on positives they agree). The per-point value is the
    // integer sum over queries plus one final IEEE division for the
    // readable average. Baseline is O(queries × corpus) like the brute
    // top-k (bounded-query serving model; querySet pins the workload in
    // the scale ledger); at scale the ranking confines to IVF candidate
    // lists exactly like the retrieval family.
    "q_knn_shapley" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val c = Similarity.withNorm(emb, "vec_id", "embedding")
        .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      val qs = c.filter(querySet)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("label").as("qlabel"))
      val train = c.filter(!querySet)
      // Every query ranks the SAME train corpus, so the rank-domain size
      // n is one global count (broadcast one-row join), not a per-query
      // window — and the suffix sum rewrites as tot − prefix + term over
      // the ALREADY rank-sorted order, so the whole pass is ONE exchange
      // + ONE sort (three window frames sharing it), never a second sort.
      val nRow = train.agg(count(lit(1)).as("n"))
      val sims = train.crossJoin(broadcast(qs))
        .select(col("query_id"), col("vec_id"),
          round(Similarity.dot(col("v"), col("qv")) /
            (col("nrm") * col("qn")), 6).as("sim"),
          (col("label") === col("qlabel")).cast("long").as("ind"))
        .crossJoin(broadcast(nRow))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
      val terms = sims
        .withColumn("rnk", row_number().over(wr).cast("long"))
        .withColumn("ind_next", lead(col("ind"), 1).over(wr))
        .withColumn("term",
          when(col("ind_next").isNull,
            col("ind") * expr("1000000000L div n"))
            .otherwise((col("ind") - col("ind_next")) *
              expr("1000000000L div greatest(5L, rnk)")))
      terms
        .withColumn("prefix", sum(col("term"))
          .over(wr.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .withColumn("tot", sum(col("term")).over(wp))
        .withColumn("s", col("tot") - col("prefix") + col("term"))
        .groupBy(col("vec_id"))
        .agg(sum(col("s")).as("shap_nano"), count(lit(1)).as("n_q"))
        .select(col("vec_id"), col("shap_nano"), col("n_q"),
          round(col("shap_nano") / (col("n_q") * lit(1e9)), 6)
            .as("avg_shap"))
    }),

    // Hard-negative mining for contrastive/embedding training: for every
    // query vector, the top-5 most-similar CORPUS vectors with a DIFFERENT
    // label — near neighbors that are semantically wrong, the negatives a
    // retrieval trainer wants. Same broadcast-queries/stream-corpus shape
    // as the brute baseline (the label predicate prunes before ranking);
    // at scale the corpus side is the IVF-confined candidate set instead
    // of the full scan — composition, not a new operator.
    "q_hard_negatives" -> ((s, dir) => {
      val c = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          Similarity.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", Similarity.l2norm(col("v")))
      val qs = c.filter(querySet)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("label").as("qlabel"))
      val sims = c.crossJoin(broadcast(qs))
        .filter(col("label") =!= col("qlabel"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("label"),
          round(Similarity.dot(col("v"), col("qv")) /
            (col("nrm") * col("qn")), 6).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      sims.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
    }),
  )

  /** Sequential-fold cosine matching [[graft.ext.Similarity.dot]]:
    * products per index left-to-right, fold with + — bit-identical to
    * Spark's `aggregate(zip_with(...))`.
    */
  /** Unrounded cosine — Spark's sequential left fold reproduced exactly
    * (same multiply order and associativity).
    */
  private def cosRaw(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a.v) + 1),
       |    i -> $a.v[i] * $b.v[i]), (x, y) -> x + y)
       |  / ($a.nrm * $b.nrm)""".stripMargin

  private def cos(a: String, b: String): String =
    s"""round(
       |  ${cosRaw(a, b)}, 6)""".stripMargin

  private val withNorm =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |c AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(list_transform(range(1, len(v) + 1),
      |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
      |  FROM e)""".stripMargin

  /** Shared centroid + argmax-assignment CTEs (`cent`, `asgn`) — ONE
    * definition for the four IVF-family oracles, same drift-proofing as
    * [[withNorm]]: a change to the assignment rule must not need four
    * synchronized edits.
    */
  private def centAsgn: String = centAsgnWhere("vec_id < 10")

  /** SemDeDup oracle body over a given assignment CTE set — the drop
    * policy (higher id of any within-cluster pair at cosine ≥ 0.3)
    * mirrors the Scala fold; shared by the fixed- and scaled-dial rows.
    */
  private def semdedupSql(asgnCtes: String): String =
    s"""WITH $withNorm,
      |$asgnCtes,
      |pairs AS (
      |  SELECT aa.vec_id AS va, ab.vec_id AS vb
      |  FROM asgn aa JOIN asgn ab ON aa.cluster_id = ab.cluster_id
      |    AND aa.vec_id < ab.vec_id
      |  JOIN c a ON a.vec_id = aa.vec_id
      |  JOIN c b ON b.vec_id = ab.vec_id
      |  WHERE ${cos("a", "b")} >= 0.3),
      |dropped AS (SELECT DISTINCT vb AS vec_id FROM pairs)
      |SELECT cluster_id, count(*) AS n_members,
      |  CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_dropped,
      |  CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_kept
      |FROM asgn LEFT JOIN dropped d USING (vec_id)
      |GROUP BY cluster_id""".stripMargin

  /** [[centAsgn]] with the centroid predicate as a parameter — the
    * corpus-scaled dial (`vec_id % 100 = 0`) shares every other line.
    */
  private def centAsgnWhere(pred: String): String =
    s"""cent AS (SELECT vec_id AS cent_id, v, nrm FROM c WHERE $pred),
       |asgn AS (
       |  SELECT vec_id, cent_id AS cluster_id FROM (
       |    SELECT x.vec_id, cent.cent_id,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${cos("x", "cent")} DESC, cent.cent_id ASC) AS rn
       |    FROM c x, cent)
       |  WHERE rn = 1)""".stripMargin

  /** Shared PQ CTEs (`pqcode`, `pqr`) — codes via the same sequential-fold
    * squared-L2 argmin (lowest-cent_id tiebreak) the Scala side folds, and
    * the reconstruction (`pqr`) shaped like `c` so [[cos]] applies
    * unchanged. ONE definition for the three PQ oracles.
    */
  private def pqCtes: String =
    s"""pqsub AS (
       |  SELECT c.vec_id, t.j, c.v[t.j*16+1 : t.j*16+16] AS sv
       |  FROM c, (SELECT unnest(range(4)) AS j) t),
       |pqcb AS (SELECT vec_id AS cent_id, j, sv AS cv
       |  FROM pqsub WHERE vec_id < 16),
       |pqd AS (
       |  SELECT s.vec_id, s.j, cb.cent_id, cb.cv,
       |    list_reduce(list_transform(range(1, 17),
       |      i -> (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i])),
       |      (x, y) -> x + y) AS d2
       |  FROM pqsub s JOIN pqcb cb ON s.j = cb.j),
       |pqcode AS (
       |  SELECT vec_id, j, cent_id AS code, cv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
       |      ORDER BY d2 ASC, cent_id ASC) AS rn
       |    FROM pqd)
       |  WHERE rn = 1),
       |pqr AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(range(1, len(v) + 1),
       |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
       |  FROM (
       |    SELECT vec_id, flatten(list(cv ORDER BY j)) AS v
       |    FROM pqcode GROUP BY vec_id))""".stripMargin

  /** Residual-PQ CTEs (expects `c`, `cent`, `asgn` in scope): residual =
    * v − assigned centroid, coded with the same sequential-fold squared-L2
    * argmin as [[pqCtes]] but codebooks seeded from vec_id 10..25 (coarse
    * centroids' own residuals are zero vectors), and `pqfull` = centroid +
    * decoded residual, shaped like `c` so [[cos]] applies unchanged.
    */
  private def pqResidCtes: String =
    s"""rsd AS (
       |  SELECT a.vec_id, a.cluster_id,
       |    list_transform(range(1, len(x.v) + 1),
       |      i -> x.v[i] - ct.v[i]) AS rv
       |  FROM asgn a
       |  JOIN c x ON x.vec_id = a.vec_id
       |  JOIN cent ct ON ct.cent_id = a.cluster_id),
       |rsub AS (
       |  SELECT r.vec_id, t.j, r.rv[t.j*16+1 : t.j*16+16] AS sv
       |  FROM rsd r, (SELECT unnest(range(4)) AS j) t),
       |rcb AS (SELECT vec_id AS cent_id, j, sv AS cv
       |  FROM rsub WHERE vec_id >= 10 AND vec_id < 26),
       |rdist AS (
       |  SELECT s.vec_id, s.j, cb.cent_id, cb.cv,
       |    list_reduce(list_transform(range(1, 17),
       |      i -> (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i])),
       |      (x, y) -> x + y) AS d2
       |  FROM rsub s JOIN rcb cb ON s.j = cb.j),
       |rcode AS (
       |  SELECT vec_id, j, cent_id AS code, cv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
       |      ORDER BY d2 ASC, cent_id ASC) AS rn
       |    FROM rdist)
       |  WHERE rn = 1),
       |rrec AS (
       |  SELECT vec_id, flatten(list(cv ORDER BY j)) AS rv
       |  FROM rcode GROUP BY vec_id),
       |pqfull AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_transform(range(1, len(v) + 1),
       |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
       |  FROM (
       |    SELECT rr.vec_id,
       |      list_transform(range(1, len(rr.rv) + 1),
       |        i -> rr.rv[i] + ct.v[i]) AS v
       |    FROM rrec rr
       |    JOIN asgn a ON a.vec_id = rr.vec_id
       |    JOIN cent ct ON ct.cent_id = a.cluster_id))""".stripMargin

  /** DuckDB twin of [[graft.ext.Similarity.cosineLshPairs]] at a given
    * (planes, bands) dial — mirrors the Scala parameterization so both
    * registered dials share one template.
    */
  private def lshTwin(planes: Int, bands: Int): String = {
    val width = planes / bands
    s"""WITH $withNorm,
      |planes AS (
      |  SELECT j.j, list_transform(range(1, 65),
      |    i -> CASE WHEN substring(md5(CAST(j.j AS VARCHAR) || ':' ||
      |           CAST(i - 1 AS VARCHAR)), 1, 1) >= '8'
      |         THEN 1.0 ELSE -1.0 END) AS h
      |  FROM (SELECT unnest(range(0, $planes)) AS j) j),
      |bits AS (
      |  SELECT c.vec_id, p.j,
      |    CASE WHEN list_reduce(list_transform(range(1, 65),
      |        i -> c.v[i] * p.h[i]), (x, y) -> x + y) > 0
      |      THEN '1' ELSE '0' END AS b
      |  FROM c, planes p),
      |sig AS (
      |  SELECT vec_id, string_agg(b, '' ORDER BY j) AS sig
      |  FROM bits GROUP BY vec_id),
      |blocks AS (
      |  SELECT s.vec_id, b.i AS block_idx,
      |    substring(sig, b.i * $width + 1, $width) AS block
      |  FROM sig s, (SELECT unnest(range(0, $bands)) AS i) b),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM blocks a JOIN blocks b
      |    ON a.block_idx = b.block_idx AND a.block = b.block
      |    AND a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, ${cos("x", "y")} AS sim
      |FROM cand
      |JOIN c x ON x.vec_id = vec_a
      |JOIN c y ON y.vec_id = vec_b
      |WHERE ${cos("x", "y")} >= 0.35""".stripMargin
  }

  /** DuckDB twin of Similarity.randomProjection + longFormatTopK: same
    * micro-unit quantization, same md5-parity sign matrix, integer dot
    * products and sum-of-squares norms into one rounded division.
    * 0-based dimension index i matches posexplode.
    */
  private val rpCtes =
    """rp_u AS (
      |  SELECT vec_id, unnest(list_transform(embedding,
      |    (x, ix) -> struct_pack(i := ix - 1,
      |      xq := CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
      |        AS BIGINT)))) AS s
      |  FROM embeddings),
      |rp_x AS (SELECT vec_id, s.i AS i, s.xq AS xq FROM rp_u),
      |rp_y AS (
      |  SELECT vec_id, sj.j,
      |    CAST(sum(xq * CASE WHEN CAST(CONCAT('0x',
      |        substring(md5('rp:' || sj.j || ':' || i), 1, 1)) AS BIGINT)
      |        % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS y
      |  FROM rp_x, range(16) sj(j) GROUP BY 1, 2),
      |rp_n AS (SELECT vec_id, sum(y * y) AS n2 FROM rp_y GROUP BY 1),
      |rp_sims AS (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |    round(CAST(sum(n.y * q.y) AS DOUBLE)
      |      / (sqrt(CAST(nn.n2 AS DOUBLE)) * sqrt(CAST(nq.n2 AS DOUBLE))),
      |      6) AS sim
      |  FROM rp_y n
      |  JOIN rp_y q ON q.j = n.j AND q.vec_id % 25 = 0
      |    AND q.vec_id < 1000000 AND n.vec_id != q.vec_id
      |  JOIN rp_n nn ON nn.vec_id = n.vec_id
      |  JOIN rp_n nq ON nq.vec_id = q.vec_id
      |  GROUP BY 1, 2, nn.n2, nq.n2),
      |rp_top AS (
      |  SELECT query_id, neighbor_id, sim, rank FROM (
      |    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
      |    FROM rp_sims)
      |  WHERE rank <= 5)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sim_rp_topk" ->
      s"""WITH $rpCtes
        |SELECT query_id, neighbor_id, sim, rank FROM rp_top""".stripMargin,

    // Hamming recomputed WITHOUT packing: per-dimension sign mismatches
    // over the raw float lists — an independent formulation, so equality
    // proves the Spark side's two-word bit packing lossless.
    "q_sim_binary_topk" ->
      s"""WITH el AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |h AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    CAST(len(list_filter(range(1, len(n.v) + 1),
        |      i -> (n.v[i] > 0) != (q.v[i] > 0))) AS BIGINT) AS hamming
        |  FROM el n, el q
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000
        |    AND n.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, hamming, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY hamming ASC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM h)
        |WHERE rank <= 5""".stripMargin,

    "q_sim_binary_recall" ->
      s"""WITH $withNorm,
        |h AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    CAST(len(list_filter(range(1, len(n.v) + 1),
        |      i -> (n.v[i] > 0) != (q.v[i] > 0))) AS BIGINT) AS hamming
        |  FROM e n, e q
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000
        |    AND n.vec_id != q.vec_id),
        |bin_top AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY hamming ASC, neighbor_id ASC) AS rank FROM h)
        |  WHERE rank <= 5),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id ASC) AS rank FROM (
        |      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |        ${cos("n", "q")} AS sim
        |      FROM c n, c q
        |      WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000
        |        AND n.vec_id != q.vec_id))
        |  WHERE rank <= 5)
        |SELECT b.query_id, count(*) AS n_true,
        |  CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  round(CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS recall_at_5
        |FROM brute b
        |LEFT JOIN bin_top r ON r.query_id = b.query_id
        |  AND r.neighbor_id = b.neighbor_id
        |GROUP BY 1""".stripMargin,

    "q_sim_rp_recall" ->
      s"""WITH $withNorm,
        |$rpCtes,
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id ASC) AS rank FROM (
        |      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |        ${cos("n", "q")} AS sim
        |      FROM c n, c q
        |      WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000
        |        AND n.vec_id != q.vec_id))
        |  WHERE rank <= 5)
        |SELECT b.query_id, count(*) AS n_true,
        |  CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  round(CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS recall_at_5
        |FROM brute b
        |LEFT JOIN rp_top r ON r.query_id = b.query_id
        |  AND r.neighbor_id = b.neighbor_id
        |GROUP BY 1""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH el AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cl AS (
        |  SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
        |  FROM el),
        |simsh AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.label,
        |    ${cos("n", "q")} AS sim
        |  FROM cl n, cl q
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.label != q.label)
        |SELECT query_id, neighbor_id, label, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM simsh)
        |WHERE rank <= 5""".stripMargin,

    "q_sim_pq_codes" ->
      s"""WITH $withNorm,
        |$pqCtes
        |SELECT vec_id, j, code FROM pqcode""".stripMargin,

    "q_sim_pq_topk" ->
      s"""WITH $withNorm,
        |$pqCtes,
        |sims AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    ${cos("n", "q")} AS sim
        |  FROM pqr n, c q
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims)
        |WHERE rank <= 5""".stripMargin,

    "q_embedding_outliers" ->
      s"""WITH $withNorm,
        |$centAsgn,
        |scored AS (
        |  SELECT x.vec_id, a.cluster_id, ${cos("x", "ct")} AS csim
        |  FROM asgn a
        |  JOIN c x ON x.vec_id = a.vec_id
        |  JOIN cent ct ON ct.cent_id = a.cluster_id),
        |thr AS (
        |  SELECT cluster_id, csim AS p10 FROM (
        |    SELECT cluster_id, csim,
        |      row_number() OVER (PARTITION BY cluster_id
        |        ORDER BY csim ASC, vec_id ASC) AS rn,
        |      count(*) OVER (PARTITION BY cluster_id) AS n
        |    FROM scored)
        |  WHERE rn = CAST(floor(0.1 * (n - 1)) AS BIGINT) + 1)
        |SELECT s.vec_id, s.cluster_id, s.csim, t.p10
        |FROM scored s JOIN thr t USING (cluster_id)
        |WHERE s.csim < t.p10""".stripMargin,

    "q_sim_pq_refined" ->
      s"""WITH $withNorm,
        |$pqCtes,
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM pqr n, c q
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 20),
        |refined AS (
        |  SELECT cand.query_id, cand.neighbor_id, ${cos("n", "q")} AS sim
        |  FROM cand
        |  JOIN c n ON n.vec_id = cand.neighbor_id
        |  JOIN c q ON q.vec_id = cand.query_id)
        |SELECT query_id, neighbor_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM refined)
        |WHERE rank <= 5""".stripMargin,

    "q_sim_pq_recall" ->
      s"""WITH $withNorm,
        |$pqCtes,
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM c n, c q
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5),
        |pq AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM pqr n, c q
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5)
        |SELECT b.query_id, count(*) AS n_true,
        |  CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  round(CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 4) AS recall_at_5
        |FROM brute b LEFT JOIN pq p
        |  ON b.query_id = p.query_id AND b.neighbor_id = p.neighbor_id
        |GROUP BY b.query_id""".stripMargin,

    "q_sim_topk_brute" ->
      s"""WITH $withNorm,
        |sims AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    ${cos("n", "q")} AS sim
        |  FROM c n, c q
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims)
        |WHERE rank <= 5""".stripMargin,

    // Same ranked cross join as the brute twin, then the Jia et al.
    // recurrence as a suffix-sum window over exact nano-unit terms —
    // every integer op mirrors the Spark side (division before the
    // signed multiply), so shap_nano matches bit-for-bit.
    "q_knn_shapley" ->
      s"""WITH $withNorm,
        |lab AS (SELECT vec_id, label FROM embeddings),
        |q AS (SELECT c.vec_id AS query_id, c.v, c.nrm,
        |    lab.label AS qlabel
        |  FROM c JOIN lab USING (vec_id)
        |  WHERE c.vec_id % 25 = 0 AND c.vec_id < 1000000),
        |tr AS (SELECT c.vec_id, c.v, c.nrm, lab.label
        |  FROM c JOIN lab USING (vec_id)
        |  WHERE NOT (c.vec_id % 25 = 0 AND c.vec_id < 1000000)),
        |sims AS (
        |  SELECT q.query_id, tr.vec_id,
        |    ${cos("tr", "q")} AS sim,
        |    CASE WHEN tr.label = q.qlabel THEN 1 ELSE 0 END AS ind
        |  FROM tr, q),
        |rk AS (
        |  SELECT query_id, vec_id, ind,
        |    CAST(row_number() OVER wd AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY query_id) AS n,
        |    lead(ind) OVER wd AS ind_next
        |  FROM sims
        |  WINDOW wd AS (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id ASC)),
        |terms AS (
        |  SELECT query_id, vec_id, rnk,
        |    CASE WHEN ind_next IS NULL THEN ind * (1000000000 // n)
        |    ELSE (ind - ind_next) * (1000000000 // greatest(5, rnk))
        |    END AS term
        |  FROM rk),
        |sv AS (
        |  SELECT query_id, vec_id,
        |    CAST(sum(term) OVER (PARTITION BY query_id ORDER BY rnk
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS BIGINT) AS s
        |  FROM terms)
        |SELECT vec_id, CAST(sum(s) AS BIGINT) AS shap_nano,
        |  count(*) AS n_q,
        |  round(CAST(sum(s) AS BIGINT) / (count(*) * 1e9), 6) AS avg_shap
        |FROM sv GROUP BY vec_id""".stripMargin,

    // Unrolled farthest-first twin: s_r accumulates selected ids, d_r is
    // the per-candidate min rounded distance to s_{r-1}, m_r its
    // (dmin DESC, vec_id) argmax — identical arithmetic to
    // Similarity.kCenterCoreset round for round. The round CTEs are
    // MATERIALIZED: DuckDB inlines plain CTEs, and the s-chain's two
    // references per round would expand the plan (and the parquet open
    // count) exponentially.
    "q_coreset_kcenter" ->
      (s"""WITH $withNorm,
        |s1 AS MATERIALIZED (SELECT (SELECT min(vec_id) FROM c) AS vid)""" +
        (2 to 10).map(r => s""",
        |d$r AS MATERIALIZED (
        |  SELECT x.vec_id, min(round(1 - ${cosRaw("x", "s")}, 6)) AS dmin
        |  FROM c x JOIN c s ON s.vec_id IN (SELECT vid FROM s${r - 1})
        |  WHERE x.vec_id NOT IN (SELECT vid FROM s${r - 1})
        |  GROUP BY 1),
        |m$r AS MATERIALIZED (SELECT vec_id, dmin FROM d$r
        |  ORDER BY dmin DESC, vec_id LIMIT 1),
        |s$r AS MATERIALIZED (SELECT vid FROM s${r - 1}
        |  UNION ALL SELECT vec_id FROM m$r)""").mkString + """
        |SELECT CAST(1 AS BIGINT) AS sel_order,
        |  (SELECT vid FROM s1) AS vec_id, CAST(0 AS DOUBLE) AS dist""" +
        (2 to 10).map(r => s"""
        |UNION ALL SELECT CAST($r AS BIGINT) AS sel_order, vec_id,
        |  round(dmin, 6) AS dist FROM m$r""").mkString).stripMargin,

    "q_sim_mrr" ->
      s"""WITH $withNorm,
        |sims AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    ${cos("n", "q")} AS sim
        |  FROM c n, c q
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000
        |    AND n.vec_id != q.vec_id),
        |tk AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |    FROM sims)
        |  WHERE rank <= 20),
        |lb AS (SELECT vec_id, label FROM embeddings),
        |h AS (
        |  SELECT t.query_id, min(t.rank) AS fh
        |  FROM tk t JOIN lb ql ON ql.vec_id = t.query_id
        |    JOIN lb nl ON nl.vec_id = t.neighbor_id
        |  WHERE ql.label = nl.label
        |  GROUP BY 1),
        |qs AS (SELECT DISTINCT query_id FROM tk)
        |SELECT qs.query_id,
        |  CAST(COALESCE(h.fh, 0) AS BIGINT) AS first_hit_rank,
        |  round(CASE WHEN h.fh IS NOT NULL
        |    THEN CAST(1 AS DOUBLE) / h.fh
        |    ELSE CAST(0 AS DOUBLE) END, 6) AS rr
        |FROM qs LEFT JOIN h ON h.query_id = qs.query_id""".stripMargin,

    "q_sim_neardup" ->
      s"""WITH $withNorm
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  ${cos("a", "b")} AS sim
        |FROM c a JOIN c b ON a.vec_id < b.vec_id
        |WHERE ${cos("a", "b")} >= 0.35""".stripMargin,

    "q_semantic_decontam" ->
      s"""WITH $withNorm,
        |b AS (
        |  SELECT vec_id, CAST(CONCAT('0x', substring(
        |    md5('split:' || CAST(vec_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |    % 100 AS bucket
        |  FROM c),
        |x AS (SELECT c.vec_id, v, nrm FROM c JOIN b USING (vec_id)
        |  WHERE bucket < 90),
        |y AS (SELECT c.vec_id, v, nrm FROM c JOIN b USING (vec_id)
        |  WHERE bucket >= 90 AND c.vec_id < 1000000),
        |sims AS (
        |  SELECT x.vec_id AS train_id, y.vec_id AS eval_id,
        |    ${cos("x", "y")} AS sim
        |  FROM x, y)
        |SELECT train_id, count(*) AS n_eval_hits, max(sim) AS max_sim,
        |  min(eval_id) AS first_eval_id
        |FROM sims WHERE sim >= 0.35
        |GROUP BY train_id""".stripMargin,

    "q_sim_kmeans_step" ->
      s"""WITH $withNorm,
        |$centAsgn,
        |x AS (
        |  SELECT a.cluster_id, unnest(range(1, len(c.v) + 1)) AS ii, c.v AS v
        |  FROM asgn a JOIN c ON c.vec_id = a.vec_id)
        |SELECT cluster_id, CAST(ii - 1 AS BIGINT) AS dim_idx,
        |  round(avg(v[ii]), 6) AS mean, count(*) AS n_members
        |FROM x GROUP BY 1, 2""".stripMargin,

    // Unrolled 3-round Lloyd twin: each round re-derives assignment
    // (argmax of the round-6 cosine against the PREVIOUS round's
    // centroids, lowest-id tiebreak) and the per-dim rounded means, then
    // rebuilds centroid lists with an ordered list() aggregate. Every
    // CTE is MATERIALIZED — the centroid chain is referenced repeatedly
    // and DuckDB inlines plain CTEs (the q_coreset_kcenter lesson).
    "q_sim_kmeans" ->
      (s"""WITH $withNorm,
        |cent0 AS MATERIALIZED (
        |  SELECT vec_id AS cent_id, v, nrm FROM c WHERE vec_id < 10)""" +
        (1 to 3).map(r => s""",
        |asgn$r AS MATERIALIZED (
        |  SELECT vec_id, cent_id AS cluster_id FROM (
        |    SELECT x.vec_id, ct.cent_id,
        |      row_number() OVER (PARTITION BY x.vec_id
        |        ORDER BY ${cos("x", "ct")} DESC, ct.cent_id ASC) AS rn
        |    FROM c x, cent${r - 1} ct)
        |  WHERE rn = 1),
        |ref$r AS MATERIALIZED (
        |  SELECT cluster_id, CAST(ii - 1 AS BIGINT) AS dim_idx,
        |    round(avg(v[ii]), 6) AS mean, count(*) AS n_members
        |  FROM (
        |    SELECT a.cluster_id, unnest(range(1, len(c.v) + 1)) AS ii,
        |      c.v AS v
        |    FROM asgn$r a JOIN c ON c.vec_id = a.vec_id)
        |  GROUP BY 1, 2),
        |centv$r AS MATERIALIZED (
        |  SELECT cluster_id AS cent_id,
        |    list(mean ORDER BY dim_idx) AS v
        |  FROM ref$r GROUP BY 1),
        |cent$r AS MATERIALIZED (
        |  SELECT cent_id, v,
        |    sqrt(list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
        |  FROM centv$r)""").mkString + """
        |SELECT cluster_id, dim_idx, mean, n_members FROM ref3""")
        .stripMargin,

    "q_vector_stats" ->
      s"""WITH $withNorm
        |SELECT vec_id,
        |  round(list_min(v), 6) AS v_min,
        |  round(list_max(v), 6) AS v_max,
        |  round(list_reduce(v, (x, y) -> x + y) / len(v), 6) AS v_mean,
        |  round(nrm, 6) AS v_norm
        |FROM c""".stripMargin,

    // Hyperplane signs regenerate from md5 parity of "plane:dim" — same
    // string, same digest, same signature on both engines. ONE template
    // for both registered dials, parameterized exactly where the Scala
    // side is.
    "q_sim_quant_topk" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS dv
        |  FROM embeddings),
        |q0 AS (
        |  SELECT vec_id, dv,
        |    greatest(list_max(list_transform(dv, x -> abs(x))), 1e-12)
        |      / 127.0 AS qscale
        |  FROM e),
        |c AS (
        |  SELECT vec_id,
        |    list_transform(dv, x -> floor(x / qscale + 0.5)) AS v
        |  FROM q0),
        |cn AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(range(1, len(v) + 1),
        |      i -> v[i] * v[i]), (x, y) -> x + y)) AS nrm
        |  FROM c),
        |sims AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    round(
        |      list_reduce(list_transform(range(1, len(n.v) + 1),
        |        i -> n.v[i] * q.v[i]), (x, y) -> x + y)
        |      / (n.nrm * q.nrm), 6) AS sim
        |  FROM cn n, cn q
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims)
        |WHERE rank <= 5""".stripMargin,

    "q_sim_neardup_lsh16" -> lshTwin(planes = 16, bands = 4),
    "q_sim_neardup_lsh" -> lshTwin(planes = 32, bands = 4),

    // Same assignment CTEs as the IVF family; the drop policy (higher id
    // of any within-cluster pair at cosine ≥ 0.3) mirrors the Scala fold.
    // The scaled row differs ONLY in the centroid predicate.
    "q_semdedup" -> semdedupSql(centAsgn),
    "q_semdedup_scaled" -> semdedupSql(centAsgnWhere("vec_id % 100 = 0")),

    // IVFADC: the q_sim_ivf shape with the neighbor side swapped from the
    // full-precision corpus `c` to the PQ reconstruction `pqr`.
    "q_sim_ivfpq" ->
      s"""WITH $withNorm,
        |$centAsgn,
        |$pqCtes,
        |sims AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    na.cluster_id, ${cos("n", "q")} AS sim
        |  FROM pqr n JOIN asgn na ON na.vec_id = n.vec_id
        |  JOIN asgn qa ON na.cluster_id = qa.cluster_id
        |  JOIN c q ON qa.vec_id = q.vec_id
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, cluster_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims)
        |WHERE rank <= 5""".stripMargin,

    // Residual IVFADC: the q_sim_ivfpq shape with the neighbor side
    // swapped to `pqfull` (centroid + decoded residual).
    "q_sim_ivfpq_residual" ->
      s"""WITH $withNorm,
        |$centAsgn,
        |$pqResidCtes,
        |sims AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    na.cluster_id, ${cos("n", "q")} AS sim
        |  FROM pqfull n JOIN asgn na ON na.vec_id = n.vec_id
        |  JOIN asgn qa ON na.cluster_id = qa.cluster_id
        |  JOIN c q ON qa.vec_id = q.vec_id
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, cluster_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims)
        |WHERE rank <= 5""".stripMargin,

    "q_sim_ivfpq_res_recall" ->
      s"""WITH $withNorm,
        |$centAsgn,
        |$pqResidCtes,
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM c n, c q
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5),
        |rtop AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM pqfull n JOIN asgn na ON na.vec_id = n.vec_id
        |    JOIN asgn qa ON na.cluster_id = qa.cluster_id
        |    JOIN c q ON qa.vec_id = q.vec_id
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5)
        |SELECT b.query_id, count(*) AS n_true,
        |  CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  round(CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 4) AS recall_at_5
        |FROM brute b LEFT JOIN rtop r
        |  ON b.query_id = r.query_id AND b.neighbor_id = r.neighbor_id
        |GROUP BY b.query_id""".stripMargin,

    "q_sim_ivf" ->
      s"""WITH $withNorm,
        |$centAsgn,
        |sims AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    na.cluster_id, ${cos("n", "q")} AS sim
        |  FROM c q JOIN asgn qa ON qa.vec_id = q.vec_id
        |  JOIN asgn na ON na.cluster_id = qa.cluster_id
        |  JOIN c n ON n.vec_id = na.vec_id
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |SELECT query_id, neighbor_id, cluster_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims)
        |WHERE rank <= 5""".stripMargin,

    "q_sim_recall" ->
      s"""WITH $withNorm,
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM c n, c q
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5),
        |$centAsgn,
        |ivf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM c q
        |    JOIN asgn qa ON qa.vec_id = q.vec_id
        |    JOIN asgn na ON na.cluster_id = qa.cluster_id
        |    JOIN c n ON n.vec_id = na.vec_id
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5)
        |SELECT b.query_id, count(*) AS n_true,
        |  CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  round(CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 4) AS recall_at_5
        |FROM brute b LEFT JOIN ivf i
        |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
        |GROUP BY b.query_id""".stripMargin,

    "q_sim_ndcg" ->
      s"""WITH $withNorm,
        |brute AS (
        |  SELECT query_id, neighbor_id, 6 - rank AS rel FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM c n, c q
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5),
        |$centAsgn,
        |ivf AS (
        |  SELECT query_id, neighbor_id, rank FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      CAST(row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("n", "q")} DESC, n.vec_id ASC) AS BIGINT)
        |        AS rank
        |    FROM c q
        |    JOIN asgn qa ON qa.vec_id = q.vec_id
        |    JOIN asgn na ON na.cluster_id = qa.cluster_id
        |    JOIN c n ON n.vec_id = na.vec_id
        |    WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000 AND n.vec_id != q.vec_id)
        |  WHERE rank <= 5),
        |scored AS (
        |  SELECT i.query_id,
        |    COALESCE(b.rel, 0) * CASE i.rank
        |      WHEN 1 THEN 1000000000 WHEN 2 THEN 630929753
        |      WHEN 3 THEN 500000000 WHEN 4 THEN 430676558
        |      ELSE 386852807 END AS contrib,
        |    b.rel
        |  FROM ivf i LEFT JOIN brute b
        |    ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id)
        |SELECT query_id, CAST(sum(contrib) AS BIGINT) AS dcg_nano,
        |  CAST(sum(CASE WHEN rel IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rel_hits,
        |  round(CAST(sum(contrib) AS BIGINT) / 10271924935.0, 6)
        |    AS ndcg_at_5
        |FROM scored GROUP BY query_id""".stripMargin,

    "q_sim_ivf_probe2" ->
      s"""WITH $withNorm,
        |$centAsgn,
        |probes AS (
        |  SELECT vec_id AS query_id, cent_id AS qc FROM (
        |    SELECT q.vec_id, cent.cent_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY ${cos("q", "cent")} DESC, cent.cent_id ASC) AS rn
        |    FROM c q, cent WHERE q.vec_id % 25 = 0 AND q.vec_id < 1000000)
        |  WHERE rn <= 2),
        |sims AS (
        |  SELECT p.query_id, n.vec_id AS neighbor_id, na.cluster_id,
        |    ${cos("n", "q")} AS sim
        |  FROM probes p
        |  JOIN asgn na ON na.cluster_id = p.qc
        |  JOIN c n ON n.vec_id = na.vec_id
        |  JOIN c q ON q.vec_id = p.query_id
        |  WHERE n.vec_id != p.query_id)
        |SELECT query_id, neighbor_id, cluster_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank
        |  FROM sims)
        |WHERE rank <= 5""".stripMargin,
  )
}
