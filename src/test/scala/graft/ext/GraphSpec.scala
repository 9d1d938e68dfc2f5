package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toSeq.toDF("src", "dst")
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference recurrence on an in-memory adjacency map — the exact same
    * integer arithmetic, independently coded.
    */
  private def reference(es: Seq[(Long, Long)], iters: Int,
      seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val e = es.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def base(n: Long) =
      if (seeds.forall(_.contains(n))) Graph.BaseNano else 0L
    var r = nodes.map(n =>
      n -> (if (seeds.forall(_.contains(n))) Graph.ScaleNano else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(n =>
        n -> (base(n) + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("two-node cycle: symmetric ranks, exact fixpoint value") {
    // 1 <-> 2: r converges toward Scale; with integer damping each round
    // is r' = 150000000 + (85*r) div 100.
    val es = Seq((1L, 2L), (2L, 1L))
    val got = ranksOf(Graph.pageRankNano(edges(es: _*), "src", "dst", 5))
    assert(got(1L) === got(2L))
    assert(got === reference(es, 5))
  }

  test("star graph matches the reference; in-linked nodes out-rank " +
      "in-degree-zero spokes") {
    // Spokes 2..5 all point at 1; 1 points back at 2, so the 1<->2 cycle
    // oscillates with period 2 (bipartite core) — the stable claims are
    // reference equality, the no-in-edge spokes pinned at the base
    // fixpoint, and node 2 (which has an in-edge) above them.
    val es = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L))
    val got = ranksOf(Graph.pageRankNano(edges(es: _*), "src", "dst", 4))
    assert(got === reference(es, 4))
    assert(got(2L) > got(3L))
    assert(got(3L) === Graph.BaseNano)
    assert(got(3L) === got(4L) && got(4L) === got(5L))
  }

  test("dangling node receives rank but redistributes none; " +
      "duplicate edges collapse") {
    // 1 -> 2 (twice, must dedup), 1 -> 3; 2 and 3 dangle.
    val es = Seq((1L, 2L), (1L, 2L), (1L, 3L))
    val got = ranksOf(Graph.pageRankNano(edges(es: _*), "src", "dst", 3))
    assert(got === reference(Seq((1L, 2L), (1L, 3L)), 3))
    // Symmetric dangling receivers tie; the source decays to the base
    // fixpoint (no in-edges).
    assert(got(2L) === got(3L))
    assert(got(1L) === Graph.BaseNano)
  }

  test("total mass never exceeds N*Scale (dangling mass only shrinks it)") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val got = ranksOf(Graph.pageRankNano(edges(es: _*), "src", "dst", 6))
    assert(got.values.sum <= 4L * Graph.ScaleNano)
    assert(got === reference(es, 6))
  }

  test("personalized pagerank: teleport mass re-enters only at seeds") {
    import org.apache.spark.sql.functions.col
    // Directed 3-cycle, seed {1}: mass decays around the cycle from the
    // seed; the exact integer trajectory matches the seeded reference.
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = ranksOf(Graph.personalizedPageRankNano(
      edges(es: _*), "src", "dst", 3, col("id") === 1L))
    assert(got === reference(es, 3, Some(Set(1L))))
    // Seed keeps its base; downstream non-seeds hold only propagated mass.
    assert(got(1L) >= Graph.BaseNano)
    assert(got.values.sum < 3L * Graph.ScaleNano)
  }

  test("a rank round equi-joins and partially aggregates — no nested " +
      "loop, map-side combine present") {
    import spark.implicits._
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L))
    val ranks = Seq((1L, Graph.ScaleNano), (2L, Graph.ScaleNano),
      (3L, Graph.ScaleNano)).toDF("id", "r")
    val outdeg = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("src", "od")
    val p = Graph.contrib(e, ranks, outdeg)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert("HashAggregate".r.findAllIn(p).size === 2, p) // partial + final
  }

  test("triangle counts on hand-checked graphs") {
    // K4: every node is in C(3,2) = 3 triangles.
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val gotK4 = ranksOf(Graph.triangleCounts(edges(k4: _*), "src", "dst"))
    assert(gotK4 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // Triangle + pendant: 1-2-3 closed, 4 hangs off 3; duplicate and
    // reversed input edges collapse; self-loops are dropped.
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 4L), (1L, 2L))
    val got = ranksOf(Graph.triangleCounts(edges(tri: _*), "src", "dst"))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // Square without diagonals: zero triangles everywhere.
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val gotSq = ranksOf(Graph.triangleCounts(edges(sq: _*), "src", "dst"))
    assert(gotSq.values.forall(_ == 0L) && gotSq.size === 4)
  }

  test("hits: hand-checked bipartite round, exact integer normalization") {
    // Hubs {1,2}, authorities {10,11}: 1->10, 1->11, 2->10.
    // Round 1 raw auths: 10 gets 2M, 11 gets 1M; max-normalize ->
    // auth(10)=1e6, auth(11)=5e5. Raw hubs: 1 gets 1.5M, 2 gets 1M;
    // normalize -> hub(1)=1e6, hub(2)=(1M*1e6)//1.5M=666666.
    val es = Seq((1L, 10L), (1L, 11L), (2L, 10L))
    val got = Graph.hitsMicro(edges(es: _*), "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(10L) === ((0L, 1000000L)))
    assert(got(11L) === ((0L, 500000L)))
    assert(got(1L) === ((1000000L, 0L)))
    assert(got(2L) === ((666666L, 0L)))
    // After more rounds scores stay normalized to [0, Scale] with the
    // max pinned at Scale on each side.
    val g3 = Graph.hitsMicro(edges(es: _*), "src", "dst", 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(g3.map(_._1).max === Graph.HitsScaleMicro)
    assert(g3.map(_._2).max === Graph.HitsScaleMicro)
    assert(g3.forall { case (h, a) =>
      h >= 0 && a >= 0 && h <= Graph.HitsScaleMicro &&
        a <= Graph.HitsScaleMicro })
  }

  test("label propagation: two cliques with one bridge settle into two " +
      "min-id communities") {
    // Cliques {1,2,3} and {10,11,12}, bridged 3-10. Hand-simulated 4
    // synchronous min-tie rounds: the left clique settles on label 1 by
    // round 3; the right clique's labels funnel through the bridge
    // endpoint's id (10's round-2 label is 3, which then wins the right
    // clique's majority) — communities {1,2,3} -> 1 and {10,11,12} -> 3,
    // and the bridge can't flip either side (one vote vs two).
    val cl = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val got = Graph.labelPropagation(edges(cl: _*), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
    // Tie-break pins: on a single edge both nodes adopt the neighbor's
    // label each round; after an even round count each ends with its own.
    val pair = Graph.labelPropagation(edges((5L, 6L)), "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pair === Map(5L -> 5L, 6L -> 6L))
  }

  test("k-core: triangle survives the peel, the pendant chain does not") {
    // Triangle {1,2,3} with a chain 3-4-5: nodes 4 and 5 never reach
    // degree 2 once the chain end peels, so the 2-core is the triangle.
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val got = Graph.kCore(edges(es: _*), "src", "dst", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false))
    // k above the max degree empties the core but keeps every node row.
    val none = Graph.kCore(edges(es: _*), "src", "dst", k = 9, rounds = 2)
      .collect().map(r => r.getBoolean(1))
    assert(none.length === 5 && none.forall(_ == false))
  }

  test("degree assortativity: a star is perfectly disassortative") {
    // K1,3: every directed edge pairs the degree-3 hub with a degree-1
    // leaf — corr over {(3,1)x3, (1,3)x3} is exactly -1.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val row = Graph.degreeAssortativity(edges(star: _*), "src", "dst")
      .head()
    assert(row.getLong(0) === 6L)
    assert(row.getDouble(1) === -1.0)
  }

  test("null endpoint fails loudly") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankNano(df, "src", "dst", 2)
    }
    assert(e.getMessage.contains("null"))
  }

  private def bfsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kTruss: a K4 survives the 4-truss, an attached triangle does " +
      "not; the 3-truss keeps both; peeling cascades") {
    // K4 on {1..4} plus a triangle {4,5,6} hanging off vertex 4.
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
    def trussEdges(k: Int) =
      Graph.kTruss(edges(es: _*), "src", "dst", k, rounds = 3)
        .collect().collect {
          case r if r.getBoolean(2) => (r.getLong(0), r.getLong(1)) }.toSet
    // k=4 (support >= 2): every K4 edge sits in 2 triangles among K4
    // edges; the pendant triangle's edges have support 1 and drop.
    assert(trussEdges(4) ===
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // k=3 (support >= 1): both cliques' edges survive.
    assert(trussEdges(3) === es.toSet)
    // k=5 (support >= 3): no edge of K4 has 3 supporting triangles once
    // peers drop — everything cascades away.
    assert(trussEdges(5) === Set.empty)
  }

  test("triangle state: every persisted table matches the recompute " +
      "path, kTrussResume == kTruss, clusteringFromCounts == " +
      "clusteringCoefficients") {
    // K4 plus a pendant triangle plus an isolated (triangle-free) edge —
    // exercises zero-support edges and zero-count nodes in the state.
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L), (7L, 8L))
    val dir = java.nio.file.Files.createTempDirectory("tri-state").toString
    Graph.writeTriangleState(edges(es: _*), "src", "dst", dir)
    val st = Graph.readTriangleState(spark, dir)
    // per-node counts match the recompute
    assert(ranksOf(st.triCounts) ===
      ranksOf(Graph.triangleCounts(edges(es: _*), "src", "dst")))
    // zero-support edge absent from support, present in edges
    assert(st.support.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .get((7L, 8L)).isEmpty)
    assert(st.edges.count() === es.size)
    // resume path == from-scratch truss at every k
    for (k <- Seq(3, 4, 5)) {
      val full = Graph.kTruss(edges(es: _*), "src", "dst", k, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      val res = Graph.kTrussResume(st.edges, st.support, k, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
      assert(res === full, s"k=$k resume != recompute")
    }
    // state-fed coefficients == recompute coefficients
    val viaState = Graph.clusteringFromCounts(st.triCounts, st.degrees)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val direct = Graph.clusteringCoefficients(edges(es: _*), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(viaState === direct)
  }

  test("bfsHops: chain distances are exact, truncation at maxHops, " +
      "unreachable nodes absent") {
    import org.apache.spark.sql.functions.col
    // Directed chain 1→2→3→4→5 plus an isolated edge 8→9.
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
    val got = bfsOf(Graph.bfsHops(edges(es: _*), "src", "dst",
      col("id") === 1L, maxHops = 3))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // maxHops beyond the diameter settles everything reachable; 8/9
    // stay absent from seed 1's component.
    val full = bfsOf(Graph.bfsHops(edges(es: _*), "src", "dst",
      col("id") === 1L, maxHops = 10))
    assert(full === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("bfsHops: multi-source takes the min over seeds and respects " +
      "edge direction") {
    import org.apache.spark.sql.functions.col
    // 1→2→3 and 5→3: seeds {1, 5} reach 3 in 2 hops via 1 but 1 hop
    // via 5 — min wins. Reverse edges are NOT followed (5 is a seed, so
    // its dist 0 row exists but nothing points from 3 back).
    val es = Seq((1L, 2L), (2L, 3L), (5L, 3L))
    val got = bfsOf(Graph.bfsHops(edges(es: _*), "src", "dst",
      col("id") === 1L || col("id") === 5L, maxHops = 5))
    assert(got === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("bfsHops: empty seed set yields empty result; null endpoint " +
      "fails loudly") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val es = Seq((1L, 2L))
    assert(Graph.bfsHops(edges(es: _*), "src", "dst",
      lit(false), maxHops = 3).isEmpty)
    val df = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.bfsHops(df, "src", "dst", col("id") === 1L, 2)
    }
    assert(e.getMessage.contains("null"))
  }
}
