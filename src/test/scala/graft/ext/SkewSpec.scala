package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("saltedJoin returns exactly the rows of the plain join") {
    import spark.implicits._
    // skewed left: one hot key with 1000 rows, a cold tail
    val left = ((1 to 1000).map(i => ("hot", i)) ++
      Seq(("cold1", 1), ("cold2", 2), ("orphan", 3))).toDF("k", "v")
    val right = Seq(("hot", 10.0), ("cold1", 20.0), ("cold2", 30.0),
      ("unmatched", 99.0)).toDF("k", "w")

    val salted = Skew.saltedJoin(left, right, "k", factor = 8)
      .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    val plain = left.join(right, "k")
      .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 1002) // 1000 hot + 2 cold; orphan/unmatched drop
  }

  test("adaptiveSaltedJoin: row parity, and only measured-hot keys salt") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = ((1 to 1000).map(i => ("hot", i)) ++
      (1 to 50).map(i => (s"cold$i", i)) ++ Seq(("orphan", 0))).toDF("k", "v")
    val right = (Seq("hot", "unmatched") ++ (1 to 50).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 1.5) }.toDF("k", "w")

    val adaptive = Skew.adaptiveSaltedJoin(left, right, "k",
      factor = 8, hotThreshold = 100L)
      .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    val plain = left.join(right, "k")
      .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString)
    assert(adaptive.toSeq == plain.toSeq)
    assert(adaptive.length == 1050)

    // The hot key's rows spread over many salts; every cold row stays on
    // salt 0 (mitigation cost proportional to the skew present).
    val hotKeys = left.groupBy(col("k")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 100L)
      .select(col("k").as("__hotkey"), lit(true).as("__hot"))
    val salted = left
      .join(broadcast(hotKeys), left("k") === col("__hotkey"), "left")
      .withColumn("__salt",
        when(col("__hot"), Skew.saltColumn(left, 8)).otherwise(lit(0)))
    assert(salted.filter(col("k") === "hot")
      .select("__salt").distinct().count() >= 6)
    assert(salted.filter(col("k") =!= "hot")
      .select("__salt").distinct().collect().map(_.getInt(0)).toSeq
      === Seq(0))
  }

  test("salt spreads a hot key over multiple sub-keys") {
    import spark.implicits._
    val left = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    // the REAL derivation saltedJoin uses — a key-only hash regression
    // would collapse this to one bucket and fail here
    val salts = left
      .withColumn("__salt", Skew.saltColumn(left, 8))
      .select("__salt").distinct().count()
    assert(salts >= 6) // ~all 8 salts hit for 1000 rows
  }

  test("AQE skew-join splits the hot partition at runtime (the no-salt path)") {
    // The OTHER skew mitigation this engine relies on at 100 TB: leave the
    // join unsalted and let AQE split oversized partitions after the
    // shuffle materializes. Pinned here with toy thresholds so a Spark
    // upgrade or a conf regression that silently disables it fails a test
    // rather than an SLA. (saltedJoin remains the tool for the case AQE
    // can't fix: a single key too hot for any partition split to help
    // downstream aggregation.)
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // md5 payloads: a constant-key partition of repeated literals would
      // compress below the skew threshold and mask the very skew under test
      import org.apache.spark.sql.functions._
      val left = spark.range(60000)
        .select(lit("hot").as("k"), md5(col("id").cast("string")).as("v"))
        .unionAll(spark.range(100).select(
          concat(lit("cold"), col("id")).as("k"),
          md5(col("id").cast("string")).as("v")))
      val right = spark.range(100)
        .select(concat(lit("cold"), col("id")).as("k"))
        .unionAll(spark.range(1).select(lit("hot").as("k")))
        .withColumn("w", length(col("k")))
      // max(v), not count(v): count-of-non-nullable rewrites to count(1)
      // and column pruning then drops the payload pre-shuffle, re-shrinking
      // the partition below the skew threshold
      val joined = left.join(right, "k")
        .agg(count(lit(1)), max(col("v")))
      // collect(), not head(): head() wraps the plan in a NEW limited
      // QueryExecution, so the original adaptive plan would never finalize
      assert(joined.collect().head.getLong(0) == 60100L)
      // after execution the adaptive plan is final; the skewed SMJ side
      // prints skew=true
      val finalPlan = joined.queryExecution.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
