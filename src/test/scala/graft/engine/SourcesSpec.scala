package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("readCsvInferred infers types from data (reference S1 landing parse)") {
    val dir = Files.createTempDirectory("graft-src")
    val p = dir.resolve("landing.csv")
    Files.write(p, "YearStart,DataValue,Topic\n2020,12.5,asthma\n2021,9.1,copd\n".getBytes)
    val df = Sources.readCsvInferred(spark, p.toString)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("YearStart") == IntegerType)
    assert(types("DataValue") == DoubleType)
    assert(types("Topic") == StringType)
    assert(df.count() == 2)
  }

  test("readCsv with an explicit schema skips inference, keeps types") {
    val dir = Files.createTempDirectory("graft-src2")
    val p = dir.resolve("landing.csv")
    Files.write(p, "a,b\n1,x\nbad,y\n".getBytes)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = Sources.readCsv(spark, p.toString, schema)
    assert(df.schema == schema)
    val rows = df.collect()
    assert(rows(0).getLong(0) == 1L)
    assert(rows(1).isNullAt(0)) // unparseable under PERMISSIVE -> null
  }

  test("JSONL round trip: writeJsonl -> readJsonl preserves rows and types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").resolve("docs").toString
    val df = Seq((1L, "hello world", 0.5), (2L, "spark docs", 0.9))
      .toDF("doc_id", "text", "quality")
    Sinks.writeJsonl(df, dir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("quality", DoubleType)))
    val back = Sources.readJsonl(spark, dir, Some(schema))
    assert(back.count() == 2)
    assert(back.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, "hello world", 0.5), Seq(2L, "spark docs", 0.9)))
    // inferred read agrees on content
    assert(Sources.readJsonl(spark, dir).count() == 2)
  }

  test("ORC round trip: overwriteOrc -> readOrc preserves rows and types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").resolve("t").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    Sinks.overwriteOrc(df, dir)
    val back = Sources.readOrc(spark, dir)
    // ORC reads everything nullable; names and types must survive
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, "a", 1.5), Seq(2L, "b", 2.5)))
  }

  test("events reader adapts to a nanos-as-long ts encoding") {
    import spark.implicits._
    // Synthesize the LongType shape the legacy TIMESTAMP(NANOS) fixture
    // presents under nanosAsLong=true: epoch-nanos int64. The reader must
    // integral-divide to micros (a float divide would corrupt ~1.7e18).
    val dir = Files.createTempDirectory("graft-evt-nanos").toString
    val nanos = 1700000000123456789L
    Seq((1L, nanos, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val df = Sources.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.selectExpr("unix_micros(ts)").head().getLong(0)
    assert(got == nanos / 1000L)
  }

  test("events reader passes a native timestamp ts encoding through") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evt-us").toString
    val micros = 1700000000123456L
    Seq((1L, new java.sql.Timestamp(0), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.lit(micros)))
      .write.parquet(s"$dir/events.parquet")
    val df = Sources.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.selectExpr("unix_micros(ts)").head().getLong(0) == micros)
  }

  test("events reader rejects an unsupported ts type loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evt-bad").toString
    Seq((1L, "not-a-time")).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Sources.events(spark, dir))
    assert(e.getMessage.contains("StringType"))
  }

  test("events shared fixture reads as microsecond instants (any encoding)") {
    val df = Sources.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.selectExpr("max(ts)").head().getTimestamp(0) != null)
  }
}
