package graft

import org.apache.spark.sql.SparkSession

/** Targeted fourth decade: the priced materializations + the events-graph
  * family at factor ~104 — the rows whose cost models carry the suite's
  * largest shuffles (m_triangle_state's wedge join was 24.1 GB of shuffle
  * at factor 52) and therefore the ones whose linearity past that point
  * is worth paying for. The FULL registry needn't pay a fourth decade:
  * everything else was clean at f26 and f52 and gains no new information
  * from 2x more of the same.
  *
  * Methodology is ScaleSuite's, via the shared [[ScaleSuite.watchdogRun]]:
  * untimed JIT warmup on the smallest fixture, builds timed first at a 2x
  * budget (zombies drained before any consumer row), then per-query
  * min(pre-pass, timed run). The ledger measures the TARGET factor only
  * and computes growth against the committed prior-decade ledger
  * (BENCH_SFx{factor/2}.json by default) — the same cross-ledger
  * comparison tools/shuffle_growth.py already performs between decades,
  * so one JVM doesn't have to pay both fixtures again.
  *
  * Dial note: the ScaleSuite default (600 s) gives builds a 1200 s
  * budget; m_triangle_state measured ~757 s at factor 52, so a LINEAR 2x
  * (~1500 s) cannot fit — exactly the mistake ScaleSuite.timeoutGuard now
  * refuses. This main defaults to 900 s (1800 s build budget: linear
  * growth + headroom) rather than silently re-running the r16 cascade.
  *
  * Usage: runMain graft.ScaleGraph [factor] [refFactor] (default 104, 52)
  * Env: SPARK_GRAFT_SF_DIR (base, default sf0.1), SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_SCALE_TIMEOUT (sec/query, default 900).
  */
object ScaleGraph {

  /** The graph family over the scaled events edge set — the VERDICT-r16
    * plan-audit rows plus the triangle-state consumers.
    */
  private[graft] val family = Seq(
    "q_triangles", "q_triangles_state", "q_clustering_coeff", "q_ktruss",
    "q_pagerank", "q_pagerank_seeded", "q_label_prop", "q_graph_bfs",
    "q_hits", "q_graph_assortativity")

  /** Per-name (scaled_sec, scaled_shuffle) out of a committed ScaleSuite
    * ledger, skipping names the prior run recorded as scaled timeouts OR
    * scaled failures (a timeout's `scaled` field is the watchdog cutoff
    * and a failure's is time-to-crash with a partial shuffle — neither is
    * a measurement a growth baseline may rest on). Query rows carry
    * failure status only in the ledger-level `scaled_failed` array (their
    * inline fields have no status), so both arrays are parsed.
    */
  private[graft] def priorScaled(ledger: String)
      : Map[String, (Double, Long)] = {
    def names(field: String): Set[String] =
      (s""""$field":\\[([^\\]]*)\\]""").r
        .findFirstMatchIn(ledger).map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSet
    val timedOut = names("scaled_timeout") ++ names("scaled_failed")
    val row = ("\"([A-Za-z0-9_]+)\":\\{\"base\":[0-9.]+," +
      "\"scaled\":([0-9.]+),([^{}]*?)\"scaled_shuffle\":([0-9]+)").r
    row.findAllMatchIn(ledger).collect {
      // materialization rows carry their status inline; query rows list
      // timeouts in scaled_timeout — skip both kinds of non-measurement
      case m if !timedOut.contains(m.group(1)) &&
          !m.group(3).contains("\"scaled_status\":\"timeout\"") &&
          !m.group(3).contains("\"scaled_status\":\"failed\"") =>
        m.group(1) -> (m.group(2).toDouble, m.group(4).toLong)
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val loadStart = Bench.loadavg()
    val factor = if (args.nonEmpty) args(0).toInt else 104
    val refFactor = if (args.length > 1) args(1).toInt else factor / 2
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_TIMEOUT", "900").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Bench.defaultCpus)
    val priorPath = java.nio.file.Paths.get(ScaleSuite.ledgerName(refFactor))
    val priorLedger =
      if (java.nio.file.Files.exists(priorPath))
        Some(new String(java.nio.file.Files.readAllBytes(priorPath),
          java.nio.charset.StandardCharsets.UTF_8))
      else None
    val prior = priorLedger.map(priorScaled)
      .getOrElse(Map.empty[String, (Double, Long)])
    // Same pre-flight guards as ScaleSuite, against the reference decade
    // scaled by the factor ratio: the dial rule (builds at 2x budget,
    // queries at 1x) and the scratch-capacity rule — the f104 attempt
    // burned 71 minutes on a disk failure the f52 ledger's largest
    // shuffle already predicted.
    if (!sys.env.get("SPARK_GRAFT_SCALE_FORCE").contains("1")) {
      priorLedger.foreach { ledger =>
        val ratio = factor.toDouble / refFactor
        // Query-budget and prior-timeout rules filtered to the family
        // this run actually executes: a non-graph query's prior wall
        // (or timeout) must not refuse a graph decade that fits the
        // dial. Builds stay unfiltered — every priced materialization
        // runs here too.
        ScaleSuite.timeoutGuard(ledger, timeoutSec, ratio,
            queryNames = Some(family.toSet))
          .orElse(ScaleSuite.diskGuard(ledger, ratio,
            java.nio.file.Files.getFileStore(
              ScaleSuite.scratchPath()).getUsableSpace,
            ScaleSuite.executionMemoryBytes()))
          .foreach { reason =>
            System.err.println(s"REFUSING factor-$factor graph decade " +
              s"(prior: factor-$refFactor ${priorPath.getFileName}): " +
              reason)
            sys.exit(2)
          }
      }
    }

    val spark = Bench.withBoundedStore(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = s"/tmp/graft-sf1/f$factor"
    ScaleFixture.build(spark, base, scaled, factor)

    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val zombieDrains = scala.collection.mutable.ArrayBuffer.empty[String]

    def run(name: String, deadlineSec: Long)(body: () => Unit)
        : ScaleSuite.Res = {
      val (res, zombie) =
        ScaleSuite.watchdogRun(spark, tally, name, deadlineSec)(body)
      // builds run strictly before their consumers here, so drain any
      // zombie inline (bounded) — its wait is its own ledger line, never
      // billed to the next timed row
      zombie.foreach { t =>
        val t0 = System.nanoTime()
        t.join(timeoutSec * 1000)
        zombieDrains += s"""{"name":"$name","drain_sec":${
          String.format(java.util.Locale.ROOT, "%.1f",
            Double.box((System.nanoTime() - t0) / 1e9))
        },"exited":${!t.isAlive}}"""
      }
      res
    }

    // untimed JIT/codegen warmup on the smallest fixture
    family.foreach(n =>
      try Bench.runToExhaustion(
        SparkEntry.queries(n)(spark, Bench.warmupDir(base)))
      catch { case scala.util.control.NonFatal(_) => () })
    Bench.resetState(spark)

    // ALL priced builds, timed, 2x budget (alphabetical, as in ScaleSuite)
    val mats = Materializations.builds.map { case (mn, build) =>
      mn -> run(mn, timeoutSec * 2)(() => build(spark, scaled))
    }

    // per-query: min(pre-pass, timed) — ScaleSuite's estimator
    val res = family.sorted.map { n =>
      def once() = run(n, timeoutSec)(() =>
        Bench.runToExhaustion(SparkEntry.queries(n)(spark, scaled)))
      val pre = once()
      n -> (if (pre.status == "ok") {
        val timed = once()
        if (timed.status == "ok")
          ScaleSuite.Res(math.min(pre.sec, timed.sec), "ok", timed.shuffle,
            pre = pre.sec, timed = timed.sec, cost = timed.cost)
        else timed
      } else pre)
    }

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val factorRatio = factor.toDouble / refFactor

    def rowJson(n: String, r: ScaleSuite.Res): String = {
      val p = prior.get(n)
      val x = p.collect { case (ps, _) if ps > 0 && r.status == "ok" =>
        fmt(r.sec / ps) }.getOrElse("null")
      val xs = p.collect { case (_, pb) if pb > 0 && r.status == "ok" =>
        fmt(r.shuffle.toDouble / pb) }.getOrElse("null")
      s""""$n":{"sec":${fmt(r.sec)},"status":"${r.status}",""" +
        s""""shuffle":${r.shuffle},""" +
        s""""prior_sec":${p.map(v => fmt(v._1)).getOrElse("null")},""" +
        s""""prior_shuffle":${p.map(_._2.toString).getOrElse("null")},""" +
        s""""x_vs_prior":$x,"x_shuffle_vs_prior":$xs,""" +
        ScaleSuite.costJson("run", r) + "}"
    }

    // growth flag: wall above ~1.1x linear (the VERDICT "≤ ~2.2x per 2x
    // data" bar) AND above the 2 s planning-noise floor; shuffle held to
    // the same bar over the 64 MB floor
    def over(n: String, r: ScaleSuite.Res): Boolean =
      prior.get(n).exists { case (ps, pb) =>
        r.status == "ok" && (
          (r.sec > 2.0 && ps > 0 && r.sec / ps > factorRatio * 1.1) ||
          (r.shuffle > 64L * 1024 * 1024 && pb > 0 &&
            r.shuffle.toDouble / pb > factorRatio * 1.1))
      }
    val flagged = (res ++ mats).collect { case (n, r) if over(n, r) => n }
    val timedOut = (res ++ mats).collect {
      case (n, r) if r.status != "ok" => s""""$n"""" }

    val line =
      s"""{"metric":"scale_graph","factor":$factor,""" +
      s""""ref_factor":$refFactor,"ref_ledger":"${priorPath.getFileName}",""" +
      s""""base_dir":"$base","scaled_dir":"$scaled",""" +
      s""""timeout_sec":$timeoutSec,""" +
      s""""not_ok":${timedOut.mkString("[", ",", "]")},""" +
      s""""over_linear":${flagged.map("\"" + _ + "\"")
        .mkString("[", ",", "]")},""" +
      s""""materializations":${mats.map { case (n, r) => rowJson(n, r) }
        .mkString("{", ",", "}")},""" +
      s""""zombie_drains":${zombieDrains.mkString("[", ",", "]")},""" +
      s""""loadavg_start":"$loadStart","loadavg_end":"${Bench.loadavg()}",""" +
      s""""cpu_probe_ms":${Bench.cpuProbeMs()},""" +
      s""""queries":${res.map { case (n, r) => rowJson(n, r) }
        .mkString("{", ",", "}")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"BENCH_SFx${factor}_graph.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
