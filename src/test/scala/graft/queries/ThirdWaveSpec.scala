package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent in-memory reference implementations for the r13 third-wave
  * operators (DBSCAN, multi-source BFS, item-item CF, KNN-Shapley, EWMA
  * control chart) on the sf0.001 fixture — the oracle gate pins engine
  * parity at sf0.01; these re-derive each answer from scratch with plain
  * Scala collections so an error SHARED by both declarative twins (a
  * misread of the published algorithm, not an engine divergence) would
  * still surface.
  */
class ThirdWaveSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Spark's round(col, s) for doubles: BigDecimal.valueOf + HALF_UP. */
  private def r(x: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  test("q_dbscan equals a union-find reference DBSCAN over all pairs") {
    val pts = t(spark, dir, "customer").select("c_custkey").collect()
      .map(_.getLong(0)).sorted
      .map(c => (c, (c % 90 - 45).toDouble + (c % 7) * 0.1,
        ((c * 7) % 180 - 90).toDouble + (c % 11) * 0.08
          + (c / 1000000) * 181.0))
    def d2(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => d2(p, q) <= 0.16).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(p => nbrs(p).size >= 5).toSet
    // Union-find over core-core ε-edges, label = component min.
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = {
      var v = x
      while (parent(v) != v) v = parent(v)
      v
    }
    for (p <- core; q <- nbrs(p) if q != p && core(q)) {
      val (a, b) = (find(p), find(q))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val coreLabel = core.map(p => p ->
      core.filter(q => find(q) == find(p)).min).toMap
    val expect = pts.map(_._1).map { p =>
      if (core(p)) (p, "core", coreLabel(p))
      else {
        val coreNbrs = nbrs(p).filter(q => q != p && core(q))
        if (coreNbrs.nonEmpty) (p, "border", coreNbrs.map(coreLabel).min)
        else (p, "noise", -1L)
      }
    }.toSet
    val got = Joins.queries("q_dbscan")(spark, dir).collect()
      .map(row => (row.getLong(0), row.getString(1), row.getLong(2))).toSet
    assert(got === expect)
  }

  test("q_graph_bfs equals a layered BFS over the collected edge set") {
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val byOrder = li.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSeq)
    val edges: Set[(Long, Long)] = byOrder.values.flatMap(ps =>
      for (a <- ps; b <- ps if a != b) yield (a, b)).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    var dist = nodes.filter(_ % 50 == 0).map(_ -> 0L).toMap
    for (d <- 1 to 3) {
      val frontier = dist.collect { case (n, dd) if dd == d - 1 => n }.toSet
      val next = edges.collect {
        case (a, b) if frontier(a) && !dist.contains(b) => b
      }
      dist = dist ++ next.map(_ -> d.toLong)
    }
    val got = Joins.queries("q_graph_bfs")(spark, dir).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got === dist)
  }

  test("q_cf_item_cosine equals a reference co-occurrence cosine top-5") {
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
      .collect().map(row => (row.getLong(0), row.getLong(1))).distinct
    val nP = li.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCount = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toMap
    val bi = pairCount.toSeq.flatMap { case ((a, b), n) =>
      Seq((a, b, n), (b, a, n)) }
    val expect = bi.map { case (item, nbr, nCo) =>
      (item, nbr, nCo, r(nCo / math.sqrt((nP(item) * nP(nbr)).toDouble), 6))
    }.groupBy(_._1).flatMap { case (_, xs) =>
      xs.sortBy(x => (-x._4, x._2)).zipWithIndex.take(5)
        .map { case ((item, nbr, nCo, cos), i) =>
          (item, nbr, nCo, cos, (i + 1).toLong) }
    }.toSet
    val got = Analytics.queries("q_cf_item_cosine")(spark, dir).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getDouble(3), row.getLong(4))).toSet
    assert(got === expect)
  }

  test("q_knn_shapley equals the Jia et al. recurrence recomputed in " +
      "exact nano arithmetic") {
    val rows = t(spark, dir, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(row => (row.getLong(0),
        row.getSeq[Float](1).map(_.toDouble).toArray, row.getInt(2)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val withNrm = rows.map { case (id, v, l) =>
      (id, v, l, math.sqrt(dot(v, v))) }
    val (qs, tr) = withNrm.partition(_._1 % 25 == 0)
    val shap = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for ((qid, qv, ql, qn) <- qs) {
      val ranked = tr.map { case (id, v, l, n) =>
        (id, r(dot(v, qv) / (n * qn), 6), if (l == ql) 1L else 0L)
      }.sortBy { case (id, sim, _) => (-sim, id) }
      val n = ranked.length
      val terms = ranked.zipWithIndex.map { case ((_, _, ind), i0) =>
        val rnk = i0 + 1L
        if (rnk == n) ind * (1000000000L / n)
        else (ind - ranked(i0 + 1)._3) * (1000000000L / math.max(5L, rnk))
      }
      val suffix = terms.scanRight(0L)(_ + _).init
      ranked.zip(suffix).foreach { case ((id, _, _), s) => shap(id) += s }
      // uniqueness sanity: round-6 sims with id tiebreak are a total order
      assert(ranked.map(x => (x._2, x._1)).distinct.length == n)
    }
    val nQ = qs.length.toLong
    val expect = tr.map(_._1).map(id => (id, shap(id), nQ,
      r(shap(id) / (nQ * 1e9), 6))).toSet
    val got = Vectors.queries("q_knn_shapley")(spark, dir).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getDouble(3))).toSet
    assert(got === expect)
  }

  test("q_ewma_control: the smoother recomputes from its own cents " +
      "column; first row is a plain average; spikes cross-multiply") {
    val rows = Events.queries("q_ewma_control")(spark, dir)
      .orderBy("event_type", "h").collect()
      .map(row => (row.getString(0), row.getLong(2),
        row.getDouble(3), row.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val cents = xs.map(_._2)
      for (i <- xs.indices) {
        val windowed = (0 to 7).flatMap(k =>
          if (i - k >= 0) Some((cents(i - k), 1L << (7 - k))) else None)
        val num = windowed.map(w => w._1 * w._2).sum
        val den = windowed.map(_._2).sum
        assert(xs(i)._3 === r(num / (den * 100.0), 4))
        val spikeRef = i > 0 && {
          val prev = (0 to 7).flatMap(k =>
            if (i - 1 - k >= 0) Some((cents(i - 1 - k), 1L << (7 - k)))
            else None)
          cents(i) * prev.map(_._2).sum > 2L * prev.map(w => w._1 * w._2).sum
        }
        assert(xs(i)._4 === spikeRef)
      }
      // first row: EWMA of one sample IS that sample
      assert(xs.head._3 === r(cents.head / 100.0, 4))
      assert(!xs.head._4)
    }
  }
}
