package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S6/S8 against embedded Derby: a real JDBC round trip — batch sink with
  * truncate-and-reload semantics, then a partitioned parallel read (the
  * replacement for the reference's serial OFFSET/LIMIT pagination).
  */
class JdbcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby")
    // keep derby.log out of the working tree
    System.setProperty("derby.stream.error.file",
      dir.resolve("derby.log").toString)
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbcBatchSink writes; jdbcPartitioned reads back in parallel") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "score")
    Sinks.jdbcBatchSink(df, url, "people", batchSize = 25,
      mode = SaveMode.Overwrite)

    val back = Sources.jdbcPartitioned(spark, url, "people",
      partitionCol = "id", lower = 1L, upper = 100L, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("score"))
      .head().getDouble(0) == (1L to 100L).map(_ * 1.5).sum)
  }

  test("overwrite mode is truncate-and-reload, append accumulates") {
    import spark.implicits._
    Sinks.jdbcBatchSink(Seq((1L, "a", 1.0)).toDF("id", "name", "score"),
      url, "tr", mode = SaveMode.Overwrite)
    Sinks.jdbcBatchSink(Seq((2L, "b", 2.0)).toDF("id", "name", "score"),
      url, "tr", mode = SaveMode.Append)
    Sinks.jdbcBatchSink(Seq((9L, "z", 9.0)).toDF("id", "name", "score"),
      url, "tr", mode = SaveMode.Overwrite)
    val back = Sources.jdbcPartitioned(spark, url, "tr", "id", 0L, 10L, 2)
    assert(back.collect().map(_.getLong(0)).toSeq == Seq(9L))
  }
}
