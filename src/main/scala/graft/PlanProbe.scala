package graft

import org.apache.spark.sql.SparkSession

/** Printed-evidence probe for cross-decade plan flips: run the NAMED
  * queries at each fixture dir and print the FINAL adaptive physical
  * plan's join/exchange skeleton — the evidence a scale-ledger
  * transition-band classification cites (a BHJ→SMJ conversion, a new
  * exchange) instead of a guessed mechanism. Runs each query to
  * exhaustion first so AQE's runtime re-plan — the thing that actually
  * executed — is what prints, not the static estimate. A missing
  * `.../f<N>` dir is built on the spot (the ScaleOne convention).
  *
  * Usage: runMain graft.PlanProbe q_name[,q_name...] <dir> [<dir>...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dirs = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Bench.defaultCpus)
    val spark = Bench.withBoundedStore(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))) {
        val f = "f(\\d+)$".r.findFirstMatchIn(d).map(_.group(1).toInt)
          .getOrElse(sys.error(s"$d missing and not .../f<N>"))
        ScaleFixture.build(spark,
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
          d, f)
      }
    }
    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    for (n <- names; d <- dirs) {
      val sh0 = tally.settled()
      val df = SparkEntry.queries(n)(spark, d)
      Bench.runToExhaustion(df)
      println(s"== $n @ $d  shuffle=${(tally.settled() - sh0) / 1024}KB")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("HashAggregate") || l.contains("AQEShuffleRead"))
        .foreach(l => println(l.replaceAll("#\\d+L?", "")
          .replaceAll(", \\[plan_id=\\d+\\]", "").take(190)))
      Bench.resetState(spark)
    }
    spark.stop()
  }
}
