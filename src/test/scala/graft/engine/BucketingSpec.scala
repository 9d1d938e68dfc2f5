package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing = pre-paid shuffle: a join of two tables bucketed on the join
  * key must plan WITHOUT an Exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans no shuffle Exchange") {
    val dir = "/root/testdata/sf0.001"
    Sinks.writeBucketed(spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 4)
    Sinks.writeBucketed(spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice"), "o_b", "o_orderkey", 4)

    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
