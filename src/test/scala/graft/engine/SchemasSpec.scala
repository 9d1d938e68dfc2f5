package graft.engine

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mirrors the reference's column-name-cleaning cases
  * (/root/reference/tests/test_postgresql_loader.py:303-320) and the
  * schema-match semantics (data_extractor.py:296-312).
  */
class SchemasSpec extends AnyFunSuite {

  test("normalizeName lowercases and maps space/dash/dot to underscore") {
    assert(Schemas.normalizeName("YearStart") == "yearstart")
    assert(Schemas.normalizeName("Location Abbr") == "location_abbr")
    assert(Schemas.normalizeName("Data-Value") == "data_value")
    assert(Schemas.normalizeName("Data.Value.Alt") == "data_value_alt")
    assert(Schemas.normalizeName("Mixed Case-Col.Name") == "mixed_case_col_name")
  }

  test("normalizeName is idempotent") {
    val names = Seq("YearStart", "Location Abbr", "A-b.C d", "already_clean")
    names.foreach { n =>
      assert(Schemas.normalizeName(Schemas.normalizeName(n)) ==
        Schemas.normalizeName(n))
    }
  }

  test("normalizeColumns renames every column, data untouched") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1, "x")).toDF("Year Start", "Topic-Name")
    val out = Schemas.normalizeColumns(df)
    assert(out.columns.toSeq == Seq("year_start", "topic_name"))
    assert(TestSpark.rows(out) == Seq(Seq(1, "x")))
  }

  test("namesMatch ignores injected metadata columns") {
    val base = StructType(Seq(StructField("a", StringType),
      StructField("b", LongType)))
    val withMeta = base
      .add(StructField("loaded_at", TimestampType))
      .add(StructField("load_date", DateType))
    assert(Schemas.namesMatch(withMeta, base))
    assert(Schemas.namesMatch(base, withMeta))
    assert(!Schemas.namesMatch(base.add(StructField("c", StringType)), base))
  }

  test("missingRequired reports absent contract columns") {
    val s = StructType(Seq(StructField("yearstart", LongType),
      StructField("topic", StringType)))
    assert(Schemas.missingRequired(s, Set("yearstart", "topic")) == Set.empty)
    assert(Schemas.missingRequired(s, Set("yearstart", "loaded_at")) ==
      Set("loaded_at"))
    // case-insensitive on BOTH sides: a mixed-case required name must not
    // report a present column as missing
    assert(Schemas.missingRequired(s, Set("YearStart", "Topic")) == Set.empty)
  }

  test("normalizeStruct renames fields, preserves types") {
    val s = StructType(Seq(StructField("Year Start", LongType),
      StructField("Data-Value", DoubleType)))
    val out = Schemas.normalizeStruct(s)
    assert(out.fieldNames.toSeq == Seq("year_start", "data_value"))
    assert(out.fields.map(_.dataType).toSeq == Seq(LongType, DoubleType))
  }

  test("typeMismatches reports per-column type drift like the loader") {
    val e = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val i = StructType(Seq(StructField("a", DoubleType), StructField("b", StringType)))
    assert(Schemas.typeMismatches(e, i) == Seq(("a", "bigint", "double")))
  }
}
