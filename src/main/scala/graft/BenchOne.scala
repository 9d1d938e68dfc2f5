package graft
import org.apache.spark.sql.SparkSession

/** Targeted bench: time named queries one at a time under the same settings
  * as [[Bench]], optionally dumping the executed plan. Usage:
  *
  *   runMain graft.BenchOne [--plan] q_name [q_name ...]
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default
  * [[Bench.defaultCpus]] — one shared constant, so the two tools never time
  * under different parallelism).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val showPlan = args.contains("--plan")
    val names = args.filterNot(_.startsWith("--"))
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

    // One query's failure must not strand the rest of the requested names —
    // but fatal JVM errors (OOM) propagate: timings from a corrupted JVM
    // would look like normal output while being garbage.
    // Same contract as Bench: cached incremental tables are built outside
    // every timer, so a standalone q_incremental_* run times only the read
    // instead of billing the whole two-load build to itself. Gated — other
    // queries shouldn't pay the two loads + compaction at startup.
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

    names.foreach { name =>
      try {
        Bench.runToExhaustion(
          SparkEntry.queries(name)(spark, Bench.warmupDir(sfDir)))
        Bench.resetState(spark) // same isolation as the suite run
        // Build INSIDE the timer, like Bench: eager materialization during
        // query construction (localCheckpoint) must be billed to the query.
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        Bench.runToExhaustion(df)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"BENCHONE $name%-28s $sec%8.3f s")
        if (showPlan)
          println(df.queryExecution.executedPlan.toString())
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(f"BENCHONE $name%-28s FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
