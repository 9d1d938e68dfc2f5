package graft.engine

import java.sql.Timestamp

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the reference's cleaning semantics, in its exact order
  * (/root/reference/data_loader.py:325-333 via main() at :404,:422,:426):
  * dedup → trim → date-coerce → numeric-fill → string fill→lower→trim.
  */
class CleaningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("normalizeStrings fills BEFORE lowering: null -> 'unknown'") {
    import spark.implicits._
    val df = Seq(Some("  MiXeD  "), None, Some("OK")).toDF("topic")
    val out = Cleaning.normalizeStrings(df)
    assert(TestSpark.rows(out).flatten == Seq("mixed", "unknown", "ok"))
  }

  test("trimAll trims every string column, schema-driven") {
    import spark.implicits._
    val df = Seq(("  a  ", 1, " b")).toDF("s1", "n", "s2")
    val out = Cleaning.trimAll(df)
    assert(TestSpark.rows(out) == Seq(Seq("a", 1, "b")))
  }

  test("fillNumeric zero-fills only numeric columns") {
    import spark.implicits._
    val df = Seq((Some(1.5), Some("x")), (None, None))
      .toDF("datavalue", "topic")
    val out = Cleaning.fillNumeric(df)
    assert(TestSpark.rows(out) == Seq(Seq(1.5, "x"), Seq(0.0, null)))
  }

  test("coerceDateCols: name-driven, unparseable -> NULL (errors=coerce)") {
    import spark.implicits._
    val df = Seq(
      ("2024-01-02 03:04:05", "2024-01-02", "not-a-date"),
      ("garbage", "x", "y"))
      .toDF("load_date_str", "StartDate", "topic")
    val out = Cleaning.coerceDateCols(df)
    val schema = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(schema("load_date_str") == TimestampType)
    assert(schema("StartDate") == TimestampType)
    assert(schema("topic") == StringType) // name lacks "date": untouched
    val r = out.collect()
    assert(r(0).getAs[Timestamp](0) == Timestamp.valueOf("2024-01-02 03:04:05"))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1)) // coerced, not thrown
  }

  test("dedupExact keeps one row per distinct tuple") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("a", 2)).toDF("k", "v")
    assert(Cleaning.dedupExact(df).count() == 2)
  }

  test("withLoadMetadata stamps injectable timestamp + derived date") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-05-06 07:08:09")
    val out = Cleaning.withLoadMetadata(Seq(1).toDF("x"), Some(ts))
    val r = out.select("loaded_at", "load_date").head()
    assert(r.getAs[Timestamp](0) == ts)
    assert(r.getAs[java.sql.Date](1) == java.sql.Date.valueOf("2024-05-06"))
  }

  test("cleanAll end-to-end on a CDC-shaped frame, order observable") {
    // If lower ran before fill, the null would surface as "Unknown" (capital
    // U). The reference fills first, so it must be lowercase.
    val schema = StructType(Seq(
      StructField("yearstart", LongType),
      StructField("datavalue", DoubleType),
      StructField("topic", StringType),
      StructField("report_date", StringType)))
    val data = Seq(
      org.apache.spark.sql.Row(2020L, null, "  Asthma  ", "2020-03-04"),
      org.apache.spark.sql.Row(2020L, null, "  Asthma  ", "2020-03-04"),
      org.apache.spark.sql.Row(2021L, 5.0, null, "bad"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data), schema)
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val out = Cleaning.cleanAll(df, Some(ts)).orderBy("yearstart")
    val r = TestSpark.rows(out)
    assert(r.size == 2) // dup dropped
    assert(r(0)(1) == 0.0) // numeric filled
    assert(r(0)(2) == "asthma") // trimmed + lowered
    assert(r(1)(2) == "unknown") // filled THEN lowered
    assert(r(0)(3) == Timestamp.valueOf("2020-03-04 00:00:00"))
    assert(r(1)(3) == null) // coerced
    assert(out.columns.takeRight(2).toSeq == Seq("loaded_at", "load_date"))
  }
}
