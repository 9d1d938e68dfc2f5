package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join family over the star schema (SURVEY §2.3 — absent in the reference,
  * part of the declared capability surface).
  *
  * Scale strategy per join:
  *   - fact⋈fact (lineitem⋈orders): shuffle hash / sort-merge on the key,
  *     AQE re-plans at runtime; both sides co-partition on the join key so
  *     this is the minimum shuffle the semantics allow.
  *   - fact⋈dim (nation, region, bands): explicit `broadcast()` — dims stay
  *     O(100s of rows..MBs) at ANY scale factor, so the build side never
  *     shuffles and the probe side streams map-side.
  *   - customer at 100 TB is NOT broadcastable → left to Catalyst/AQE,
  *     which picks broadcast at small SF and sort-merge at scale.
  *   - semi/anti: `left_semi`/`left_anti` — no payload duplication, the
  *     probe side never widens.
  *   - band (theta) join: broadcast nested loop with the 4-row band table as
  *     the build side — the only NLJ in the surface, and its small side is
  *     constant-size by construction.
  */
object Joins {

  /** Deletion-neighborhood blocking keys (FastSS): md5 digests of
    * {s} ∪ {s minus char i}. Two strings within one Levenshtein edit
    * ALWAYS share a variant — substitution at i: both minus i are equal;
    * insertion/deletion: the longer minus the edited char IS the shorter;
    * equality: the undeleted variant. (The converse is not claimed:
    * sharing a variant admits some lev-2 pairs, which the exact verify
    * rejects.) Used by q_entity_resolution; the completeness law is
    * property-pinned in SelectionOpsSpec.
    */
  private[queries] def deletionVariants(n: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = array_union(
    array(unhex(md5(n))),
    transform(sequence(lit(1), length(n)), i =>
      unhex(md5(concat(n.substr(lit(1), i - 1),
        n.substr(i + 1, length(n)))))))

  /** The co-purchase pair list (parts sharing an order, both directions,
    * self-pairs dropped) — the edge feed of the whole graph family, ONE
    * definition so the pagerank/triangle/truss/assortativity queries
    * cannot silently diverge on graph construction.
    */
  private def coPurchasePairs(s: SparkSession, dir: String,
      aName: String, bName: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val other = li.select(col("l_orderkey"),
      col("l_partkey").as("r_partkey"))
    li.join(other, Seq("l_orderkey"))
      .filter(col("l_partkey") =!= col("r_partkey"))
      .select(col("l_partkey").as(aName), col("r_partkey").as(bName))
  }

  /** Scratch-cached [[graft.ext.Graph.writeTriangleState]] layout over
    * the co-purchase graph — built once per fixture dir, read by every
    * triangle-family consumer (the wedge join is the suite's largest
    * shuffle; paying it per-query was the r13 verdict's top perf debt).
    */
  private[graft] def triStateDir(s: SparkSession, dir: String): String =
    Scratch.cached(s"tri-state:$dir") { tmp =>
      val o = tmp + "/state"
      graft.ext.Graph.writeTriangleState(
        coPurchasePairs(s, dir, "pa", "pb"), "pa", "pb", o)
      o
    }

  /** Register bucketed external-table twins of orders/customer for this
    * fixture, both bucketed AND sorted on the join key with the same bucket
    * count — the write-time layout that lets a repeated join/aggregate on
    * that key run with ZERO exchange. This is the single biggest recurring-
    * shuffle lever at 100 TB: pay the shuffle once at ingest, then every
    * co-keyed join and aggregation reads co-located buckets. Data lives in
    * a Scratch temp dir (`.option("path")` → external table). The catalog
    * entry is per-session: a later session in the same JVM finds the data
    * already written (Scratch cache) and re-REGISTERS it via DDL over the
    * existing files instead of rewriting them. Table names carry an md5 of
    * the fixture path — content-addressed, so two fixtures can never share
    * a name.
    */
  private[graft] def ensureBucketed(s: SparkSession, dir: String)
      : (String, String) = synchronized {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    val (oTbl, cTbl) = (s"graft_orders_b_$suffix", s"graft_cust_b_$suffix")
    val base = Scratch.cached(s"bucketed:$dir")(identity)
    for ((tbl, src, key, cols) <- Seq(
        (oTbl, "orders", "o_custkey",
          Seq("o_orderkey", "o_custkey", "o_totalprice")),
        (cTbl, "customer", "c_custkey",
          Seq("c_custkey", "c_name", "c_mktsegment")))) {
      if (!s.catalog.tableExists(tbl)) {
        val projected = t(s, dir, src).select(cols.map(col): _*)
        if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$base/$tbl"))) {
          // Data already on disk from an earlier session: register only.
          s.sql(s"CREATE TABLE $tbl (${projected.schema.toDDL}) " +
            s"USING parquet CLUSTERED BY ($key) SORTED BY ($key) " +
            s"INTO 16 BUCKETS LOCATION '$base/$tbl'")
        } else {
          projected.write.bucketBy(16, key).sortBy(key)
            .option("path", s"$base/$tbl")
            .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
            .saveAsTable(tbl)
        }
      }
    }
    (oTbl, cTbl)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bucketed co-located join + same-key aggregate: both tables were
    // written bucketed/sorted on custkey, so the sort-merge join AND the
    // per-customer aggregate reuse the bucket partitioning — the whole
    // plan carries ZERO Exchange (PlanSpec-pinned). The merge hint only
    // rules out broadcast at toy SF; at 100 TB neither side broadcasts and
    // SMJ-over-buckets is what the planner picks anyway.
    "q_join_bucketed" -> ((s, dir) => {
      val (oTbl, cTbl) = ensureBucketed(s, dir)
      val o = s.table(oTbl)
      val c = s.table(cTbl).filter(col("c_mktsegment") === "BUILDING")
      o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
    }),

    // Equi inner join fact⋈fact + aggregate.
    "q_join_inner" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
    }),

    // Full star chain: two fact joins + two broadcast dim joins.
    "q_join_star" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
    }),

    // Left semi: customers with at least one order (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // Left anti: customers with no orders (NOT EXISTS).
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // Left outer + aggregate: line count per order including empty orders.
    "q_join_outer" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
        .groupBy(col("o_orderkey"))
        .agg(count(col("l_orderkey")).as("n_lines"))
    }),

    // Full outer of two aggregates: customers vs suppliers per nation.
    "q_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, c("nk") === su("snk"), "full")
        .select(
          coalesce(col("nk"), col("snk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    // Band (theta / range) join: parts into price bands — broadcast nested
    // loop with a constant-size build side.
    "q_join_band" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val bands = s.createDataFrame(Seq(
        ("b1_under_925", 0.0, 925.0),
        ("b2_925_950", 925.0, 950.0),
        ("b3_950_975", 950.0, 975.0),
        ("b4_over_975", 975.0, 1e9))).toDF("band", "lo", "hi")
      p.join(broadcast(bands),
          p("p_retailprice") >= bands("lo") && p("p_retailprice") < bands("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_parts"),
          round(avg(col("p_retailprice")), 4).as("avg_price"))
    }),

    // Binned interval join: point-in-interval with NO equi key — the shape
    // Spark can only plan as a nested-loop join naively, which is the
    // classic scale trap (probe × build with no hash path). The standard
    // fix: quantize time into fixed bins, explode each interval over the
    // bins it covers (+1 slack bin for the exclusive end), map each point
    // to its single bin, equi-join on the bin, and let the exact
    // containment predicate prune the edge bins. Each point has ONE bin,
    // so no pair can match twice — no dedup pass. The join becomes a
    // hash/broadcast join on the bin key (PlanSpec pins no
    // nested-loop), and the only cost knob is bin width vs interval
    // length (bins-per-interval = fanout of the small side).
    "q_join_interval_binned" -> ((s, dir) => {
      val binSec = 600L // 10-minute bins over 20-minute intervals
      val ev = t(s, dir, "events")
      val iv = ev.filter(col("user_id") % 50 === 0)
        .groupBy(col("user_id").as("iv_user"))
        .agg(min(col("ts")).as("lo"))
        .withColumn("hi", col("lo") + expr("INTERVAL 20 MINUTES"))
      val ivBins = iv.withColumn("bin",
        explode(sequence(
          floor(unix_timestamp(col("lo")) / binSec),
          floor(unix_timestamp(col("hi")) / binSec))))
      val evBins = ev
        .withColumn("bin", floor(unix_timestamp(col("ts")) / binSec))
      evBins.join(ivBins,
          evBins("bin") === ivBins("bin") &&
            col("ts") >= col("lo") && col("ts") < col("hi"))
        .groupBy(col("iv_user"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total"))
        .select(col("iv_user").as("user_id"), col("n_events"), col("total"))
    }),

    // Right outer: every part keeps a row even with zero lineitem sales
    // (the preserved side is the RIGHT input — the mirror of q_join_outer's
    // left form, completing the outer-join family).
    "q_join_right" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"), "right")
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(count(col("l_orderkey")).as("n_lines"))),

    // Fuzzy (edit-distance) join: vocabulary pairs within levenshtein 1 —
    // the entity-resolution primitive (typo'd brands, OCR'd names). NOT a
    // quadratic all-pairs: two strings one edit apart share the first
    // character or the last (one edit can't change both ends — except two
    // distinct single-char words, the one blind spot, absent from any real
    // token vocabulary and caught by the blocking-free oracle if it ever
    // appears), so two equi-joins on those 1-char blocking keys produce a
    // complete candidate set and levenshtein verifies only candidates —
    // the same block→verify shape as the LSH dedup family. Both joins
    // shuffle on the block key; candidate count is Σ per-block n², bounded
    // by the blocking-key fanout, not corpus².
    "q_fuzzy_join" -> ((s, dir) => {
      val words = t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("w"))
        .distinct().localCheckpoint()
      def block(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
        val a = words.select(col("w").as("word_a"), key(col("w")).as("k"))
        val b = words.select(col("w").as("word_b"), key(col("w")).as("k"))
        a.join(b, Seq("k")).filter(col("word_a") < col("word_b"))
          .select("word_a", "word_b")
      }
      block(w => substring(w, 1, 1))
        .union(block(w => substring(w, -1, 1)))
        .distinct()
        .withColumn("dist",
          levenshtein(col("word_a"), col("word_b")).cast("long"))
        .filter(col("dist") === 1)
    }),

    // Grid-blocked spatial radius join over the reference's Geolocation
    // domain (WKT points, functions/Wkt.scala): customers within 0.9° of
    // a supplier, planar degree-space distance. NOT a cross join: points
    // land in 1° grid cells, the small side expands to its 3×3 neighbor
    // cells (a ≤0.9 radius cannot escape them), and the join is an
    // EQUI-join on the cell key — the same bin→verify shape as
    // q_join_interval_binned, candidates Σ per-cell n_a×n_b. Coordinates
    // are synthesized deterministically from the keys (the multimodal
    // family's fixture-synthesis pattern: pure integer arithmetic + one
    // double offset, identical in both engines); the oracle verifies
    // blocking-free over all pairs, independently proving the grid
    // lossless (the q_fuzzy_join oracle stance).
    "q_spatial_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        col("c_custkey").as("cust"),
        ((col("c_custkey") % 90) - 45 + 0.5).as("lat"),
        (((col("c_custkey") * 7) % 180) - 90 + 0.5).as("lon"))
      val supp = t(s, dir, "supplier").select(
        col("s_suppkey").as("supp"),
        ((col("s_suppkey") % 90) - 45 + 0.3).as("slat"),
        (((col("s_suppkey") * 7) % 180) - 90 + 0.3).as("slon"))
      val custCell = cust
        .withColumn("cx", floor(col("lat")))
        .withColumn("cy", floor(col("lon")))
      val suppCells = supp
        .withColumn("dx", explode(array((-1 to 1).map(lit(_)): _*)))
        .withColumn("dy", explode(array((-1 to 1).map(lit(_)): _*)))
        .withColumn("cx", floor(col("slat")) + col("dx"))
        .withColumn("cy", floor(col("slon")) + col("dy"))
      val d2 = (col("lat") - col("slat")) * (col("lat") - col("slat")) +
        (col("lon") - col("slon")) * (col("lon") - col("slon"))
      custCell.join(suppCells, Seq("cx", "cy"))
        .withColumn("d2", d2)
        .filter(col("d2") <= 0.81)
        .select(col("cust"), col("supp"), round(col("d2"), 6).as("d2"))
    }),

    // PageRank over the part co-purchase graph (Page et al. 1999): parts
    // are linked when they appear in the same order (the lineitem
    // self-join on l_orderkey — the ONE corpus-scale operation; the graph
    // it contracts to is |parts|-sized), then 5 synchronous rank rounds in
    // exact nano-unit longs (graft.ext.Graph.pageRankNano: damping as the
    // integer map (85·x) div 100, dangling mass dropped, one O(E) edge
    // shuffle per round, ranks localCheckpointed). Deterministic: integer
    // sums are order-free, so the twin is bit-identical by construction.
    "q_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val other = li.select(col("l_orderkey"),
        col("l_partkey").as("r_partkey"))
      val edges = li.join(other, Seq("l_orderkey"))
        .filter(col("l_partkey") =!= col("r_partkey"))
        .select(col("l_partkey").as("src"), col("r_partkey").as("dst"))
      graft.ext.Graph.pageRankNano(edges, "src", "dst", iters = 5)
    }),

    // Personalized PageRank (Haveliwala 2002): teleport mass re-enters
    // only at the seed parts (every 50th partkey), so rank concentrates
    // in the seeds' co-purchase neighborhoods — the "related items"
    // primitive. Same graph, same integer recurrence, seed-gated base.
    "q_pagerank_seeded" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val other = li.select(col("l_orderkey"),
        col("l_partkey").as("r_partkey"))
      val edges = li.join(other, Seq("l_orderkey"))
        .filter(col("l_partkey") =!= col("r_partkey"))
        .select(col("l_partkey").as("src"), col("r_partkey").as("dst"))
      graft.ext.Graph.personalizedPageRankNano(edges, "src", "dst",
        iters = 4, seed = col("id") % 50 === 0)
    }),

    // Per-part triangle counts on the co-purchase graph (Suri &
    // Vassilvitskii 2011): degree-ordered orientation caps out-degree at
    // O(√E), wedges come from one self-equi-join of the oriented list,
    // and the closing edge is one more equi-join — three shuffles, no
    // nested loops, each triangle counted once and credited to all three
    // corners (graft.ext.Graph.triangleCounts). This row stays the
    // RECOMPUTE baseline; q_triangles_state reads the materialized state
    // under the same oracle.
    "q_triangles" -> ((s, dir) =>
      graft.ext.Graph.triangleCounts(
        coPurchasePairs(s, dir, "pa", "pb"), "pa", "pb")),

    // The MATERIALIZED-STATE twin of q_triangles (the q_dedup_state_kept
    // proof shape): Graph.writeTriangleState persists the one wedge
    // enumeration; this row reads the node-sized tri_counts table. The
    // oracle is IDENTICAL to q_triangles', so a green row IS the proof
    // that state-read == recompute.
    "q_triangles_state" -> ((s, dir) =>
      graft.ext.Graph.readTriangleState(s, triStateDir(s, dir)).triCounts),

    // Probabilistic record linkage (Fellegi-Sunter 1969): within-nation
    // customer pairs scored by per-field agreement log-likelihood ratios
    // ln(m/u) / ln((1-m)/(1-u)) with documented (m, u) parameters —
    // name within 1 edit (m=.9, u=.001), balance within 100 (m=.8,
    // u=.05), same segment (m=.95, u=.2). The weights are PRECOMPUTED
    // nano-unit literals (same trick as q_sim_ndcg's discounts), so the
    // pair score is an exact integer sum — no ln at query time, no
    // engine drift. Blocking on nationkey bounds candidates at
    // Σ per-nation n² (the dial gets finer at scale: nation × segment ×
    // balance band); only likely matches (weight > 0) are emitted.
    // Candidate generation is NOT the within-nation cross product (19.7×
    // superlinear in the r12 scale ledger): a pair can clear weight > 0
    // ONLY IF the names agree (name weight alone outweighs both
    // disagreements) OR balance AND segment both agree (their sum
    // outweighs the name disagreement) — every other pattern is negative.
    // So candidates are the UNION of two lossless blocked arms, scored
    // and thresholded afterwards:
    //   1. name arm: DELETION-NEIGHBORHOOD blocking (FastSS): each side
    //      emits {name} ∪ {name minus char i}; two strings within one
    //      edit always share a variant (substitution: delete the edited
    //      position from both; indel: the longer minus the inserted char
    //      IS the shorter; equality: the undeleted variant). An equi-join
    //      on (nation, variant md5) sizes blocks by TRUE neighbor counts
    //      — a prefix/suffix split would degenerate here because the
    //      constant 'Customer#0000…' prefix concentrates all entropy in
    //      the last few chars;
    //   2. balance∧segment arm: equi-join on (nation, segment, 100-wide
    //      balance band) with ±1 band expansion on one side (a ≤100 gap
    //      can't escape the neighbor band — the spatial-join move).
    // The oracle stays the blocking-free all-pairs scorer, independently
    // proving the decomposition lossless.
    "q_entity_resolution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val a = c.select(col("c_custkey").as("cust_a"),
        col("c_name").as("name_a"), col("c_nationkey").as("nk"),
        col("c_acctbal").as("bal_a"), col("c_mktsegment").as("seg_a"))
      val b = c.select(col("c_custkey").as("cust_b"),
        col("c_name").as("name_b"), col("c_nationkey").as("nk"),
        col("c_acctbal").as("bal_b"), col("c_mktsegment").as("seg_b"))
      // ONE variant explode feeds both self-join sides (r19: the md5-
      // per-deletion transform is the query's CPU and ran once per side;
      // the simhashPairs checkpoint-before-self-join convention applies).
      // Variants shuffle as 16-byte unhex(md5) binaries, not 32-char hex.
      val nv = c.select(col("c_custkey").as("ck"), col("c_nationkey")
          .as("nk"), explode(deletionVariants(col("c_name"))).as("k"))
        .localCheckpoint()
      val nameArm = nv.select(col("ck").as("cust_a"), col("nk"), col("k"))
        .join(nv.select(col("ck").as("cust_b"), col("nk"), col("k")),
          Seq("nk", "k"))
        .filter(col("cust_a") < col("cust_b"))
        .select("cust_a", "cust_b")
      val balArm = a
        .withColumn("seg", col("seg_a"))
        .withColumn("band", floor(col("bal_a") / 100).cast("long"))
        .select("cust_a", "bal_a", "nk", "seg", "band")
        .join(b
          .withColumn("seg", col("seg_b"))
          .withColumn("e", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("band",
            floor(col("bal_b") / 100).cast("long") + col("e"))
          .select("cust_b", "bal_b", "nk", "seg", "band"),
          Seq("nk", "seg", "band"))
        .filter(col("cust_a") < col("cust_b") &&
          abs(col("bal_a") - col("bal_b")) <= 100.0)
        .select("cust_a", "cust_b")
      val cand = nameArm.union(balArm).distinct()
      cand
        .join(a, Seq("cust_a"))
        .join(b.drop("nk"), Seq("cust_b"))
        .withColumn("w_name",
          when(levenshtein(col("name_a"), col("name_b")) <= 1,
            6802394763L).otherwise(-2301584593L))
        .withColumn("w_bal",
          when(abs(col("bal_a") - col("bal_b")) <= 100.0,
            2772588722L).otherwise(-1558144619L))
        .withColumn("w_seg",
          when(col("seg_a") === col("seg_b"), 1558144618L)
            .otherwise(-2772588723L))
        .withColumn("weight_nano",
          col("w_name") + col("w_bal") + col("w_seg"))
        .filter(col("weight_nano") > 0)
        .select(col("cust_a"), col("cust_b"),
          (col("w_name") > 0).as("name_agree"),
          (col("w_bal") > 0).as("bal_agree"),
          (col("w_seg") > 0).as("seg_agree"), col("weight_nano"))
    }),

    // Skew-salted join over a deliberately hot-keyed slice: l_orderkey % 5
    // gives five keys carrying 20% of lineitem EACH — the shape that
    // serializes onto five tasks in a plain shuffle join. saltedJoin spreads
    // every hot key over 8 sub-keys; the oracle is the PLAIN join, pinning
    // row parity of the mitigation.
    "q_skew_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") % 5).as("hot_key"))
      val r = t(s, dir, "orders")
        .groupBy((col("o_orderkey") % 5).as("hot_key"))
        .agg(round(sum(col("o_totalprice")), 2).as("bucket_rev"))
      graft.ext.Skew.saltedJoin(l, r, "hot_key", factor = 8)
    }),

    // Adaptive twin: the hot keys are MEASURED (one skew-immune count
    // agg, > 5000 rows ⇒ hot), broadcast back, and only hot rows salt —
    // mitigation cost proportional to the skew present, a no-op on a
    // uniform day. Key layout: half the fact rows pile on key 0 (hot),
    // the rest spread over ~500 cold keys; oracle is the plain join
    // (row-parity is the whole claim).
    "q_skew_join_adaptive" -> ((s, dir) => {
      val skewL = when(col("l_orderkey") % 10 < 5, lit(0L))
        .otherwise(col("l_orderkey") % 1000)
      val skewO = when(col("o_orderkey") % 10 < 5, lit(0L))
        .otherwise(col("o_orderkey") % 1000)
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          skewL.as("skew_key"))
      val r = t(s, dir, "orders")
        .groupBy(skewO.as("skew_key"))
        .agg(round(sum(col("o_totalprice")), 2).as("bucket_rev"))
      graft.ext.Skew.adaptiveSaltedJoin(l, r, "skew_key", factor = 8,
        hotThreshold = 5000L)
    }),

    // Local clustering coefficient (Watts-Strogatz 1998) over the same
    // co-purchase graph, READ FROM STATE: the wedge join already ran in
    // writeTriangleState, so this is one node-sized join and the exact
    // integer arithmetic into a single rounded IEEE division
    // (Graph.clusteringFromCounts — the same composition the recompute
    // path uses). The DuckDB oracle recomputes from scratch, so the
    // green row proves the state path, not just the formula.
    "q_clustering_coeff" -> ((s, dir) => {
      val st = graft.ext.Graph.readTriangleState(s, triStateDir(s, dir))
      graft.ext.Graph.clusteringFromCounts(st.triCounts, st.degrees)
    }),

    // HITS hubs/authorities (Kleinberg 1999) on the DIRECTED
    // supplier→part supply graph — suppliers are pure hubs, parts pure
    // authorities, the canonical bipartite HITS setting. 3 rounds of
    // exact micro-unit integer arithmetic with max-normalization
    // (graft.ext.Graph.hitsMicro); the max rides as a one-row broadcast,
    // never a driver collect.
    "q_hits" -> ((s, dir) => {
      // A lineitem with a null supplier or part identifies no edge —
      // drop it here rather than tripping hitsMicro's null guard.
      val edges = t(s, dir, "lineitem")
        .filter(col("l_suppkey").isNotNull && col("l_partkey").isNotNull)
        .select((col("l_suppkey") + 1000000L).as("src"),
          col("l_partkey").as("dst"))
      graft.ext.Graph.hitsMicro(edges, "src", "dst", iters = 3)
    }),

    // Label propagation community detection (Raghavan et al. 2007) over
    // the part co-purchase graph — the near-linear community pass that
    // groups co-occurring parts without a target cluster count. Four
    // synchronous rounds; ties go to the SMALLEST label (the original's
    // random tie-break would diverge across engines — same determinism
    // substitution the dedup clusters make). All-integer arithmetic, one
    // O(E) neighbor join + (node, label) hash-agg per round
    // (graft.ext.Graph.labelPropagation).
    "q_label_prop" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val other = li.select(col("l_orderkey"),
        col("l_partkey").as("r_partkey"))
      val pairs = li.join(other, Seq("l_orderkey"))
        .filter(col("l_partkey") =!= col("r_partkey"))
        .select(col("l_partkey").as("pa"), col("r_partkey").as("pb"))
      graft.ext.Graph.labelPropagation(pairs, "pa", "pb", iters = 4)
    }),

    // Multi-source BFS hop distances from the seed parts (every 50th
    // partkey) over the co-purchase graph — the "how far is everything
    // from the catalog anchors" primitive (graph feature for retrieval /
    // neighborhood expansion). graft.ext.Graph.bfsHops: frontier
    // expansion, one O(E) equi-join + LEFT ANTI per round, settled set
    // localCheckpointed; distances are exact small integers so the twin
    // (a depth-bounded recursive CTE taking min hop per node) matches
    // bit-for-bit.
    "q_graph_bfs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val other = li.select(col("l_orderkey"),
        col("l_partkey").as("r_partkey"))
      val edges = li.join(other, Seq("l_orderkey"))
        .filter(col("l_partkey") =!= col("r_partkey"))
        .select(col("l_partkey").as("src"), col("r_partkey").as("dst"))
      graft.ext.Graph.bfsHops(edges, "src", "dst",
        col("id") % 50 === 0, maxHops = 3)
        .select(col("node_id").as("part_id"), col("dist"))
    }),

    // DBSCAN (Ester et al. 1996) over the synthesized customer points —
    // the density clustering a curation pipeline runs on 2-D projections
    // (e.g. UMAP'd embeddings) to find coherent regions vs noise. Fully
    // composed from the engine's own scale primitives: the ε-neighborhood
    // count is the q_spatial_join grid-blocked self-join (1° cells, 3×3
    // expansion — lossless for ε = 0.4 < 1), core↔core edges feed
    // Dedup.connectedComponents (min-label = deterministic cluster id),
    // and border points take the MIN core-neighbor's cluster (standard
    // DBSCAN leaves border assignment order-dependent; pinning min makes
    // it deterministic). Noise keeps cluster −1. The oracle verifies
    // blocking-free over all pairs with a recursive-CTE closure,
    // independently proving the grid lossless (the q_spatial_join
    // stance). Per-id jitter makes the density structure real: points
    // spread inside a cell and chain across cell borders, so all three
    // roles occur. The `div 1e6` longitude band keeps density CONSTANT
    // under fixture replication (ScaleFixture shifts replica ids by
    // +r·1e6; without the band every replica lands on the same 180
    // cells and the ε-pair volume grows ×factor² — 61M pairs at factor
    // 10, an OOM, where constant density is linear). A world that grows
    // WITH the corpus is the realistic 100 TB spatial regime; bands sit
    // 181° apart so they can never chain, and the term is identically 0
    // on every real sf dir (max custkey ≪ 1e6), leaving oracle rows
    // untouched at every verify scale — the querySet-pinning precedent.
    "q_dbscan" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(
        col("c_custkey").as("pid"),
        ((col("c_custkey") % 90) - 45 + (col("c_custkey") % 7) * 0.1)
          .as("lat"),
        (((col("c_custkey") * 7) % 180) - 90
          + (col("c_custkey") % 11) * 0.08
          + expr("c_custkey div 1000000") * 181.0).as("lon"))
      val left = pts
        .withColumn("cx", floor(col("lat")))
        .withColumn("cy", floor(col("lon")))
      val right = pts.select(col("pid").as("qid"), col("lat").as("qlat"),
          col("lon").as("qlon"))
        .withColumn("dx", explode(array((-1 to 1).map(lit(_)): _*)))
        .withColumn("dy", explode(array((-1 to 1).map(lit(_)): _*)))
        .withColumn("cx", floor(col("qlat")) + col("dx"))
        .withColumn("cy", floor(col("qlon")) + col("dy"))
      val d2 = (col("lat") - col("qlat")) * (col("lat") - col("qlat")) +
        (col("lon") - col("qlon")) * (col("lon") - col("qlon"))
      // ε-neighborhoods INCLUDING self (the paper's |N_ε(p)| ≥ minPts).
      // pid-keyed session-width checkpoint layout (r19 A/B: 3.5 s vs
      // 4.0 s off the AQE-coalesced grid-join output).
      val nbr = left.join(right, Seq("cx", "cy")).filter(d2 <= 0.16)
        .select(col("pid"), col("qid"))
        .repartition(col("pid")).localCheckpoint()
      val core = nbr.groupBy(col("pid"))
        .agg(count(lit(1)).as("n_nbrs"))
        .filter(col("n_nbrs") >= 5).select(col("pid"))
      val coreEdges = nbr.filter(col("pid") < col("qid"))
        .join(core, Seq("pid"))
        .join(core.select(col("pid").as("qid")), Seq("qid"))
      val cc = graft.ext.Dedup.connectedComponents(coreEdges, "pid", "qid")
        .select(col("doc_id").as("pid"), col("cluster_id"))
      // Isolated cores (ε-dense but no core neighbor) root their own
      // cluster — the reflexive closure the oracle's `reach` carries.
      val coreLab = core.join(cc, Seq("pid"), "left")
        .select(col("pid"),
          coalesce(col("cluster_id"), col("pid")).as("cluster_id"))
      val borderLab = nbr.filter(col("pid") =!= col("qid"))
        .join(core, Seq("pid"), "left_anti")
        .join(coreLab.select(col("pid").as("qid"),
          col("cluster_id")), Seq("qid"))
        .groupBy(col("pid")).agg(min(col("cluster_id")).as("cluster_id"))
      pts.select(col("pid"))
        .join(coreLab.withColumnRenamed("cluster_id", "core_cl"),
          Seq("pid"), "left")
        .join(borderLab.withColumnRenamed("cluster_id", "border_cl"),
          Seq("pid"), "left")
        .select(col("pid"),
          when(col("core_cl").isNotNull, "core")
            .when(col("border_cl").isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce(col("core_cl"), col("border_cl"), lit(-1L))
            .as("cluster_id"))
    }),

    // 10-truss of the co-purchase graph (Cohen 2008): keep edges
    // corroborated by ≥ 8 triangles among surviving edges, 3 synchronous
    // peel rounds — the edge-grained cohesion ladder above
    // q_dedup_kcore's degree peel; a truss shakes out the hub-and-spoke
    // artifacts a core keeps. Round 1 — the full-graph enumeration, by
    // far the largest — reads the MATERIALIZED per-edge support
    // (Graph.kTrussResume); rounds 2-3 re-enumerate over survivors only,
    // under the O(sqrt E) degree orientation. The twin recomputes all
    // three rounds with the naive lo<hi wedge join — support counts are
    // orientation-independent, so row-for-row equality proves both the
    // orientation and the state-read lossless. 39,405 of 115,729 edges
    // survive at sf0.01 — still cascading at round 3.
    "q_ktruss" -> ((s, dir) => {
      val st = graft.ext.Graph.readTriangleState(s, triStateDir(s, dir))
      graft.ext.Graph.kTrussResume(st.edges, st.support, k = 10,
        rounds = 3)
    }),

    // Degree assortativity (Newman 2002) of the co-purchase graph: do
    // popular parts co-occur with other popular parts? One corr over the
    // both-direction edge list with endpoint degrees joined on.
    "q_graph_assortativity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val other = li.select(col("l_orderkey"),
        col("l_partkey").as("r_partkey"))
      val pairs = li.join(other, Seq("l_orderkey"))
        .filter(col("l_partkey") =!= col("r_partkey"))
        .select(col("l_partkey").as("pa"), col("r_partkey").as("pb"))
      graft.ext.Graph.degreeAssortativity(pairs, "pa", "pb")
    }),
  )

  /** Shared DuckDB CTE chain for the triangle family — canonical
    * undirected part co-purchase edges `p`, nodes `n`, degrees `dg`,
    * (deg, id)-oriented edges `o`/`od`, wedges `w`, triangles `t`,
    * per-node counts `pn`. Mirrors graft.ext.Graph.triangleCounts.
    */
  private val triangleCtes: String =
    """p AS (
      |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
      |    greatest(a.l_partkey, b.l_partkey) AS hi
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey != b.l_partkey),
      |n AS (SELECT lo AS id FROM p UNION SELECT hi FROM p),
      |dg AS (SELECT id, count(*) AS deg FROM (
      |    SELECT lo AS id FROM p UNION ALL SELECT hi FROM p) GROUP BY 1),
      |o AS (
      |  SELECT CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg
      |      AND p.lo < p.hi)
      |    THEN p.lo ELSE p.hi END AS src,
      |    CASE WHEN dl.deg < dh.deg OR (dl.deg = dh.deg
      |      AND p.lo < p.hi)
      |    THEN p.hi ELSE p.lo END AS dst
      |  FROM p JOIN dg dl ON dl.id = p.lo JOIN dg dh ON dh.id = p.hi),
      |od AS (
      |  SELECT o.src, o.dst, dg.deg AS ddeg
      |  FROM o JOIN dg ON dg.id = o.dst),
      |w AS (
      |  SELECT e1.src, e1.dst AS v, e2.dst AS ww
      |  FROM od e1 JOIN od e2 ON e1.src = e2.src
      |  WHERE e1.ddeg < e2.ddeg
      |    OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst)),
      |t AS (
      |  SELECT w.src AS a, w.v AS b, w.ww AS c
      |  FROM w JOIN o ON o.src = w.v AND o.dst = w.ww),
      |pn AS (
      |  SELECT id, count(*) AS n FROM (
      |    SELECT a AS id FROM t UNION ALL SELECT b FROM t
      |    UNION ALL SELECT c FROM t)
      |  GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    // The twin ignores layout entirely: bucketing must be result-invisible.
    "q_join_bucketed" ->
      """SELECT o_custkey, c_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_custkey, c_name""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_star" ->
      """SELECT r_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_outer" ->
      """SELECT o_orderkey, count(l_orderkey) AS n_lines
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_join_full" ->
      """SELECT coalesce(nk, snk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust,
        |  coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS snk, count(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) s
        |ON nk = snk
        |ORDER BY nationkey""".stripMargin,

    "q_join_band" ->
      """SELECT band, count(*) AS n_parts,
        |  round(avg(p_retailprice), 4) AS avg_price
        |FROM part
        |JOIN (VALUES ('b1_under_925', 0.0, 925.0),
        |             ('b2_925_950', 925.0, 950.0),
        |             ('b3_950_975', 950.0, 975.0),
        |             ('b4_over_975', 975.0, 1e9)) AS b(band, lo, hi)
        |ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    // The oracle is the UNBINNED range join: binning must be row-invisible.
    "q_join_interval_binned" ->
      """WITH iv AS (
        |  SELECT user_id AS iv_user, min(ts) AS lo,
        |    min(ts) + INTERVAL 20 MINUTE AS hi
        |  FROM events WHERE user_id % 50 = 0 GROUP BY user_id)
        |SELECT iv.iv_user AS user_id, count(*) AS n_events,
        |  round(sum(e.value), 2) AS total
        |FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.hi
        |GROUP BY 1""".stripMargin,

    // The oracle is the UNSALTED join: the mitigation must be row-invisible.
    "q_skew_join" ->
      """WITH l AS (SELECT l_orderkey, l_linenumber,
        |    l_orderkey % 5 AS hot_key FROM lineitem),
        |r AS (SELECT o_orderkey % 5 AS hot_key,
        |    round(sum(o_totalprice), 2) AS bucket_rev
        |  FROM orders GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.hot_key, r.bucket_rev
        |FROM l JOIN r USING (hot_key)""".stripMargin,

    "q_skew_join_adaptive" ->
      """WITH l AS (SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 10 < 5 THEN 0
        |      ELSE l_orderkey % 1000 END AS skew_key
        |  FROM lineitem),
        |r AS (SELECT
        |    CASE WHEN o_orderkey % 10 < 5 THEN 0
        |      ELSE o_orderkey % 1000 END AS skew_key,
        |    round(sum(o_totalprice), 2) AS bucket_rev
        |  FROM orders GROUP BY 1)
        |SELECT l.l_orderkey, l.l_linenumber, l.skew_key, r.bucket_rev
        |FROM l JOIN r USING (skew_key)""".stripMargin,

    "q_join_right" ->
      """SELECT p_partkey, p_name, count(l_orderkey) AS n_lines
        |FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name""".stripMargin,

    // Blocking-free all-pairs verify (the q_fuzzy_join stance): a pair
    // the Spark grid ever missed would surface as a row-count mismatch.
    "q_spatial_join" ->
      """WITH cust AS (
        |  SELECT c_custkey AS cust,
        |    (c_custkey % 90) - 45 + CAST(0.5 AS DOUBLE) AS lat,
        |    ((c_custkey * 7) % 180) - 90 + CAST(0.5 AS DOUBLE) AS lon
        |  FROM customer),
        |supp AS (
        |  SELECT s_suppkey AS supp,
        |    (s_suppkey % 90) - 45 + CAST(0.3 AS DOUBLE) AS slat,
        |    ((s_suppkey * 7) % 180) - 90 + CAST(0.3 AS DOUBLE) AS slon
        |  FROM supplier)
        |SELECT cust, supp,
        |  round((lat - slat) * (lat - slat) +
        |    (lon - slon) * (lon - slon), 6) AS d2
        |FROM cust, supp
        |WHERE (lat - slat) * (lat - slat) + (lon - slon) * (lon - slon)
        |  <= CAST(0.81 AS DOUBLE)""".stripMargin,

    // Unrolled 5-iteration twin of Graph.pageRankNano — same integer
    // recurrence r_i(v) = 150000000 + (85 · Σ r_{i-1}(u) // od(u)) // 100,
    // so equality is exact (long sums are order-free, // == div on
    // positives).
    "q_pagerank" ->
      ("""WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey != b.l_partkey),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |o AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
        |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM n)""" +
        (1 to 5).map(i => s""",
        |c$i AS (
        |  SELECT e.dst AS id, sum(r.r // o.od) AS c
        |  FROM e JOIN r${i - 1} r ON r.id = e.src JOIN o ON o.src = e.src
        |  GROUP BY 1),
        |r$i AS (
        |  SELECT n.id,
        |    CAST(150000000 + (85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS r
        |  FROM n LEFT JOIN c$i c ON c.id = n.id)""").mkString + """
        |SELECT id AS node_id, r AS rank_nano FROM r5""").stripMargin,

    "q_pagerank_seeded" ->
      ("""WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey != b.l_partkey),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nb AS (
        |  SELECT id, CAST(CASE WHEN id % 50 = 0 THEN 150000000 ELSE 0 END
        |    AS BIGINT) AS base
        |  FROM n),
        |o AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
        |r0 AS (
        |  SELECT id, CAST(CASE WHEN base > 0 THEN 1000000000 ELSE 0 END
        |    AS BIGINT) AS r
        |  FROM nb)""" +
        (1 to 4).map(i => s""",
        |c$i AS (
        |  SELECT e.dst AS id, sum(r.r // o.od) AS c
        |  FROM e JOIN r${i - 1} r ON r.id = e.src JOIN o ON o.src = e.src
        |  GROUP BY 1),
        |r$i AS (
        |  SELECT nb.id,
        |    CAST(nb.base + (85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS r
        |  FROM nb LEFT JOIN c$i c ON c.id = nb.id)""").mkString + """
        |SELECT id AS node_id, r AS rank_nano FROM r4""").stripMargin,

    // Same orientation, same wedge order, so each triangle materializes
    // exactly once on both engines; totals cross-checked against a
    // blocking-free three-way join during development.
    "q_triangles" ->
      s"""WITH $triangleCtes
        |SELECT n.id AS node_id, CAST(COALESCE(pn.n, 0) AS BIGINT)
        |  AS n_triangles
        |FROM n LEFT JOIN pn ON pn.id = n.id""".stripMargin,

    // VERBATIM q_triangles oracle — the state row must hash-match the
    // recompute row's ground truth exactly (the q_dedup_state_kept
    // proof shape).
    "q_triangles_state" ->
      s"""WITH $triangleCtes
        |SELECT n.id AS node_id, CAST(COALESCE(pn.n, 0) AS BIGINT)
        |  AS n_triangles
        |FROM n LEFT JOIN pn ON pn.id = n.id""".stripMargin,

    // Exact integers into one IEEE division (CAST(2 AS DOUBLE), never a
    // DECIMAL literal), rounded to 6.
    "q_clustering_coeff" ->
      s"""WITH $triangleCtes
        |SELECT n.id AS node_id, dg.deg AS degree,
        |  CAST(COALESCE(pn.n, 0) AS BIGINT) AS n_triangles,
        |  CASE WHEN dg.deg >= 2
        |    THEN round(CAST(2 AS DOUBLE) * COALESCE(pn.n, 0)
        |      / (dg.deg * (dg.deg - 1)), 6)
        |    ELSE CAST(0 AS DOUBLE) END AS coeff
        |FROM n JOIN dg ON dg.id = n.id
        |LEFT JOIN pn ON pn.id = n.id""".stripMargin,

    // Unrolled 3-round HITS twin: same micro-unit integer
    // max-normalization (x·10^6 // max), scalar-subquery max.
    "q_hits" ->
      ("""WITH e AS (
        |  SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst
        |  FROM lineitem
        |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS hub FROM n)""" +
        (1 to 3).map(i => s""",
        |ar$i AS (
        |  SELECT e.dst AS id, sum(h.hub) AS s
        |  FROM e JOIN h${i - 1} h ON h.id = e.src GROUP BY 1),
        |a$i AS (
        |  SELECT n.id, CAST(COALESCE(
        |      (ar.s * 1000000) // (SELECT max(s) FROM ar$i), 0) AS BIGINT)
        |    AS auth
        |  FROM n LEFT JOIN ar$i ar ON ar.id = n.id),
        |hr$i AS (
        |  SELECT e.src AS id, sum(a.auth) AS s
        |  FROM e JOIN a$i a ON a.id = e.dst GROUP BY 1),
        |h$i AS (
        |  SELECT n.id, CAST(COALESCE(
        |      (hr.s * 1000000) // (SELECT max(s) FROM hr$i), 0) AS BIGINT)
        |    AS hub
        |  FROM n LEFT JOIN hr$i hr ON hr.id = n.id)""").mkString + """
        |SELECT n.id AS node_id, h3.hub AS hub_micro, a3.auth AS auth_micro
        |FROM n JOIN h3 ON h3.id = n.id JOIN a3 ON a3.id = n.id""")
        .stripMargin,

    "q_entity_resolution" ->
      """WITH pairs AS (
        |  SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |    CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
        |      THEN 6802394763 ELSE -2301584593 END AS w_name,
        |    CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 100.0
        |      THEN 2772588722 ELSE -1558144619 END AS w_bal,
        |    CASE WHEN a.c_mktsegment = b.c_mktsegment
        |      THEN 1558144618 ELSE -2772588723 END AS w_seg
        |  FROM customer a JOIN customer b
        |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey)
        |SELECT cust_a, cust_b, w_name > 0 AS name_agree,
        |  w_bal > 0 AS bal_agree, w_seg > 0 AS seg_agree,
        |  CAST(w_name + w_bal + w_seg AS BIGINT) AS weight_nano
        |FROM pairs WHERE w_name + w_bal + w_seg > 0""".stripMargin,

    // Unrolled 4-round LPA twin: per round, neighbor-label counts then
    // the (max count, min label) argmax via a window max + min(lbl) over
    // the tied rows — integer-exact, so equality with the Spark side's
    // max(struct(n, -lbl)) argmax is by construction.
    "q_label_prop" ->
      ("""WITH p AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
        |    greatest(a.l_partkey, b.l_partkey) AS hi
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey != b.l_partkey),
        |nbr AS (SELECT lo AS id, hi AS nb FROM p
        |        UNION ALL SELECT hi, lo FROM p),
        |n AS (SELECT lo AS id FROM p UNION SELECT hi FROM p),
        |l0 AS (SELECT id, id AS lbl FROM n)""" +
        (1 to 4).map(i => s""",
        |c$i AS (
        |  SELECT nbr.id, l.lbl, count(*) AS cnt
        |  FROM nbr JOIN l${i - 1} l ON l.id = nbr.nb GROUP BY 1, 2),
        |l$i AS (
        |  SELECT id, min(lbl) AS lbl FROM (
        |    SELECT id, lbl, cnt, max(cnt) OVER (PARTITION BY id) AS mx
        |    FROM c$i)
        |  WHERE cnt = mx GROUP BY id)""").mkString + """
        |SELECT id AS node_id, lbl AS community FROM l4""").stripMargin,

    // Endpoint degrees over the doubled canonical edge list; corr
    // rounded 4 (the q_stats_profile float-aggregate posture).
    "q_graph_assortativity" ->
      s"""WITH $triangleCtes,
        |de AS (SELECT lo AS a, hi AS b FROM p
        |       UNION ALL SELECT hi, lo FROM p)
        |SELECT count(*) AS n_directed_edges,
        |  round(corr(da.deg, db.deg), 4) AS assortativity
        |FROM de
        |JOIN dg da ON da.id = de.a
        |JOIN dg db ON db.id = de.b""".stripMargin,

    // Unrolled 3-round peel twin: each round re-enumerates surviving
    // triangles (lo<hi wedge join + closing edge) and filters on the
    // exact support count. Every round CTE is MATERIALIZED — each is
    // read three times by the next round's triangle join, and DuckDB
    // inlines plain CTEs (the q_dedup_kcore precedent).
    "q_ktruss" ->
      ("""WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS lo,
        |    greatest(a.l_partkey, b.l_partkey) AS hi
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey != b.l_partkey)""" +
        (1 to 3).map(r => s""",
        |tr$r AS MATERIALIZED (
        |  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
        |  FROM e${r - 1} e1
        |  JOIN e${r - 1} e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
        |  JOIN e${r - 1} e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
        |sup$r AS MATERIALIZED (
        |  SELECT lo, hi, count(*) AS n FROM (
        |    SELECT a AS lo, b AS hi FROM tr$r
        |    UNION ALL SELECT a, c FROM tr$r
        |    UNION ALL SELECT b, c FROM tr$r)
        |  GROUP BY 1, 2),
        |e$r AS MATERIALIZED (
        |  SELECT e.lo, e.hi FROM e${r - 1} e
        |  JOIN sup$r s ON s.lo = e.lo AND s.hi = e.hi
        |  WHERE s.n >= 8)""").mkString + """
        |SELECT e0.lo, e0.hi, e3.lo IS NOT NULL AS in_truss
        |FROM e0 LEFT JOIN e3 ON e3.lo = e0.lo AND e3.hi = e0.hi""")
        .stripMargin,

    // Depth-bounded recursive closure carrying the hop count; min(d) per
    // node IS the BFS distance (the walk enumerates every ≤3-hop path
    // endpoint, deduplicated per (node, d) by the recursive UNION).
    "q_graph_bfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey != b.l_partkey),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |walk(id, d) AS (
        |  SELECT id, CAST(0 AS BIGINT) FROM n WHERE id % 50 = 0
        |  UNION
        |  SELECT e.dst, w.d + 1 FROM walk w
        |  JOIN e ON e.src = w.id WHERE w.d < 3)
        |SELECT id AS part_id, min(d) AS dist FROM walk GROUP BY id"""
        .stripMargin,

    // Blocking-free all-pairs ε-neighborhoods + a recursive reach closure
    // over core↔core edges (reflexive, so an isolated core roots its own
    // cluster) — proves the Spark side's grid blocking AND its iterative
    // min-label propagation exact in one shot.
    "q_dbscan" ->
      """WITH RECURSIVE pts AS (
        |  SELECT c_custkey AS pid,
        |    (c_custkey % 90) - 45 + (c_custkey % 7) * CAST(0.1 AS DOUBLE)
        |      AS lat,
        |    ((c_custkey * 7) % 180) - 90
        |      + (c_custkey % 11) * CAST(0.08 AS DOUBLE)
        |      + (c_custkey // 1000000) * CAST(181.0 AS DOUBLE) AS lon
        |  FROM customer),
        |nbr AS (
        |  SELECT a.pid, b.pid AS qid
        |  FROM pts a, pts b
        |  WHERE (a.lat - b.lat) * (a.lat - b.lat)
        |    + (a.lon - b.lon) * (a.lon - b.lon) <= CAST(0.16 AS DOUBLE)),
        |core AS (SELECT pid FROM nbr GROUP BY pid HAVING count(*) >= 5),
        |ce AS (
        |  SELECT n.pid AS a, n.qid AS b FROM nbr n
        |  JOIN core ca ON ca.pid = n.pid
        |  JOIN core cb ON cb.pid = n.qid
        |  WHERE n.pid != n.qid),
        |reach AS (
        |  SELECT pid AS src, pid AS dst FROM core
        |  UNION
        |  SELECT r.src, ce.b FROM reach r JOIN ce ON ce.a = r.dst),
        |corelab AS (SELECT src AS pid, min(dst) AS cluster_id
        |            FROM reach GROUP BY src),
        |borderlab AS (
        |  SELECT n.pid, min(cl.cluster_id) AS cluster_id
        |  FROM nbr n JOIN corelab cl ON cl.pid = n.qid
        |  WHERE n.pid != n.qid
        |    AND n.pid NOT IN (SELECT pid FROM core)
        |  GROUP BY n.pid)
        |SELECT p.pid,
        |  CASE WHEN c.cluster_id IS NOT NULL THEN 'core'
        |       WHEN b.cluster_id IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role,
        |  coalesce(c.cluster_id, b.cluster_id, CAST(-1 AS BIGINT))
        |    AS cluster_id
        |FROM pts p
        |LEFT JOIN corelab c ON c.pid = p.pid
        |LEFT JOIN borderlab b ON b.pid = p.pid""".stripMargin,

    // Deliberately BLOCKING-FREE: the oracle runs exact levenshtein over
    // ALL word pairs (fine for DuckDB at vocabulary size), so a candidate
    // pair the Spark-side first/last-char blocking missed would surface as
    // a row-count mismatch — the oracle independently proves the blocking
    // lossless on this vocabulary, rather than sharing its blind spots.
    "q_fuzzy_join" ->
      """WITH words AS (
        |  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part)
        |SELECT a.w AS word_a, b.w AS word_b,
        |  CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        |FROM words a JOIN words b ON a.w < b.w
        |WHERE levenshtein(a.w, b.w) = 1""".stripMargin,
  )
}
