package graft.engine

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's truncate/recreate/new decision cases
  * (/root/reference/tests/test_postgresql_loader.py:154-265).
  */
class EvolutionSpec extends AnyFunSuite {

  private val s1 = StructType(Seq(
    StructField("yearstart", LongType), StructField("topic", StringType)))
  private val s2 = StructType(Seq(
    StructField("yearstart", LongType), StructField("question", StringType)))

  test("absent table -> CreateNew") {
    assert(Evolution.plan(None, s1) == Evolution.CreateNew)
  }

  test("matching column names -> Truncate (keep DDL, wipe rows)") {
    assert(Evolution.plan(Some(s1), s1) == Evolution.Truncate)
  }

  test("matching names ignore metadata columns") {
    val withMeta = s1
      .add(StructField("loaded_at", TimestampType))
      .add(StructField("load_date", DateType))
    assert(Evolution.plan(Some(withMeta), s1) == Evolution.Truncate)
  }

  test("name drift -> Recreate (drop + create from inferred schema)") {
    assert(Evolution.plan(Some(s1), s2) == Evolution.Recreate)
  }

  test("column order does not matter (set comparison, like the reference)") {
    val reordered = StructType(s1.fields.reverse)
    assert(Evolution.plan(Some(s1), reordered) == Evolution.Truncate)
  }
}
