package graft

import org.apache.spark.sql.SparkSession

/** Targeted scale measurement: time only the NAMED queries at the base
  * fixture and at an ALREADY-BUILT scaled fixture (e.g.
  * `/tmp/graft-sf1/f10` left by [[ScaleSuite]]) — the fast loop for
  * iterating on one query's growth factor without paying the full
  * two-fixture registry sweep. Same methodology as ScaleSuite where it
  * matters for a ratio: untimed warmup pass per query per fixture
  * (JIT/codegen/Scratch builds), then one timed run each, same JVM.
  *
  * Usage: runMain graft.ScaleOne <baseDir> <scaledDir> q_name [q_name...]
  *
  * A missing scaledDir of the form `.../f<N>` is built on the spot via
  * [[ScaleFixture]] — the fast loop shouldn't require a prior full-suite
  * run just to exist.
  */
object ScaleOne {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val scaled = args(1)
    val names = args.drop(2)
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
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(scaled))) {
      val f = "f(\\d+)$".r.findFirstMatchIn(scaled).map(_.group(1).toInt)
        .getOrElse(sys.error(s"$scaled missing and not .../f<N> — can't infer factor"))
      ScaleFixture.build(spark, base, scaled, f)
    }
    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    def time(n: String, dir: String): (Double, Long) = {
      val sh0 = tally.settled()
      val t0 = System.nanoTime()
      Bench.runToExhaustion(SparkEntry.queries(n)(spark, dir))
      ((System.nanoTime() - t0) / 1e9, tally.settled() - sh0)
    }
    names.foreach { n =>
      Seq(base, scaled).foreach(d => time(n, d)) // warmup, untimed
      Bench.resetState(spark)
      val (b, _) = time(n, base)
      val (s, sh) = time(n, scaled)
      println(f"[scale-one] $n base=$b%.3fs scaled=$s%.3fs x=${s / b}%.2f " +
        f"scaled_shuffle=${sh / 1024 / 1024}%dMB")
    }
    spark.stop()
  }
}
