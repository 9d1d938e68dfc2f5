package graft

import org.apache.spark.sql.SparkSession

/** A/B price of the graph family's edge-checkpoint storage level at one
  * scale fixture — the measurement behind the r18 ledger's one `weak`
  * item: the f78 graph rows (`q_graph_assortativity` ×3.47,
  * `q_graph_bfs` ×2.03 wall at ×1.50/×1.28 bytes) were ATTRIBUTED to
  * the serialized-checkpoint deserialization tax that bought the
  * fourth decade (ext/Graph.scala `edgeStorage` scaladoc), but the
  * attribution was prose. This main runs the same queries on the same
  * fixture twice — `ser` (MEMORY_AND_DISK_SER, the default that
  * survives f78) and `deser` (MEMORY_AND_DISK, the pre-r18 default
  * that OOM'd the f78 builds) — under ScaleSuite's watchdogged
  * min-of-two methodology, and ledgers wall + executor-CPU + GC +
  * spill per (query, mode). Three outcomes, all informative:
  *
  *   - deser faster at similar gc → the wall gap IS deserialization
  *     CPU, quantified; the ser default is a priced trade, not a
  *     regression.
  *   - deser comparable → the attribution was wrong; the superlinear
  *     walls need another explanation.
  *   - deser times out / dies on storage pressure (the r18 build
  *     failure mode, now on the query side) → ser is not a tax but a
  *     feasibility boundary at this scale.
  *
  * Queries: the two flagged recompute rows plus `q_pagerank` as the
  * control (its f78 wall was clean ×1.20, so the control should show a
  * SMALL mode gap — per-round localCheckpoints are node-sized except
  * the one edge checkpoint). `q_clustering_coeff`'s ×6.39 state-read
  * oddity is excluded by design: it reads node-sized parquet, not edge
  * checkpoints, so this dial cannot explain it — the full-registry f78
  * rerun's min-of-two + cpu fields adjudicate that row.
  *
  * The ledger file is REWRITTEN after every measurement: a fatal
  * OOM in the deser arm must not erase the ser arm's evidence.
  *
  * Usage: runMain graft.GraphStorageAb [factor] (default 78)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  *      SPARK_GRAFT_SCALE_TIMEOUT (sec/query, default 900).
  */
object GraphStorageAb {

  private[graft] val family =
    Seq("q_graph_assortativity", "q_graph_bfs", "q_pagerank")

  def main(args: Array[String]): Unit = {
    val loadStart = Bench.loadavg()
    val factor = if (args.nonEmpty) args(0).toInt else 78
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_TIMEOUT", "900").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Bench.defaultCpus)
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

    // untimed JIT/codegen warmup on the smallest fixture
    family.foreach(n =>
      try Bench.runToExhaustion(
        SparkEntry.queries(n)(spark, Bench.warmupDir(base)))
      catch { case scala.util.control.NonFatal(_) => () })
    Bench.resetState(spark)

    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

    val rows = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), ScaleSuite.Res]
    val outPath = java.nio.file.Paths.get(
      s"BENCH_SFx${factor}_storage_ab.json")

    def flush(): Unit = {
      val qjson = rows.map { case ((mode, n), r) =>
        s""""${mode}:$n":{"sec":${fmt(r.sec)},"status":"${r.status}",""" +
          s""""shuffle":${r.shuffle},""" + ScaleSuite.costJson("run", r) +
          "}"
      }.mkString("{", ",", "}")
      val line =
        s"""{"metric":"graph_storage_ab","factor":$factor,""" +
        s""""scaled_dir":"$scaled","timeout_sec":$timeoutSec,""" +
        s""""loadavg_start":"$loadStart","loadavg_end":"${Bench.loadavg()}",""" +
        s""""cpu_probe_ms":${Bench.cpuProbeMs()},"queries":$qjson}"""
      java.nio.file.Files.write(outPath,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    // ser first: it is the arm known to survive this fixture, so its
    // evidence is on disk before the deser arm takes any OOM risk.
    for (mode <- Seq("ser", "deser")) {
      System.setProperty("spark.graft.graph.storage", mode)
      family.foreach { n =>
        def once() = ScaleSuite.watchdogRun(spark, tally,
          s"$mode:$n", timeoutSec)(() =>
          Bench.runToExhaustion(SparkEntry.queries(n)(spark, scaled)))._1
        val pre = once()
        val r = if (pre.status == "ok") {
          val timed = once()
          if (timed.status == "ok")
            ScaleSuite.Res(math.min(pre.sec, timed.sec), "ok",
              timed.shuffle, pre = pre.sec, timed = timed.sec,
              cost = timed.cost)
          else timed
        } else pre
        rows((mode, n)) = r
        flush()
      }
    }
    System.clearProperty("spark.graft.graph.storage")
    flush()
    println(new String(java.nio.file.Files.readAllBytes(outPath),
      java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
