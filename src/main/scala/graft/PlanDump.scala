package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for named queries to files —
  * the optimization-round evidence artifact (plans/rNN/<query>_{before,
  * after}.txt). Each query is run to exhaustion FIRST so the
  * AdaptiveSparkPlan section prints the final re-optimized plan (the
  * thing that executed), not the pre-AQE estimate; note that iterative
  * queries materialize their per-round plans behind localCheckpoint
  * boundaries, so the printed tree is the post-checkpoint tail — the
  * per-round shape is pinned by GraphSpec/PlanSpec instead.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> q_name [q_name ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Bench.defaultCpus)
    val spark = Bench.withBoundedStore(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // Same pre-build gating as BenchOne so state-reading rows work alone.
    if (names.exists(n =>
        n.startsWith("q_incremental") || n == "q_dedup_incremental"))
      queries.Incremental.ensureBuilt(spark, sfDir)
    if (names.contains("q_join_bucketed"))
      queries.Joins.ensureBucketed(spark, sfDir)
    if (names.exists(Set("q_triangles_state", "q_clustering_coeff",
        "q_ktruss")))
      queries.Joins.triStateDir(spark, sfDir)
    if (names.contains("q_dedup_state_kept"))
      queries.Docs.dedupStateDir(spark, sfDir)
    if (names.contains("q_dedup_state_incr"))
      queries.Docs.dedupStateIncrDir(spark, sfDir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      Bench.runToExhaustion(df)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLANDUMP wrote $outDir/${n}_$suffix.txt")
      Bench.resetState(spark)
    }
    spark.stop()
  }
}
