package graft.engine

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S7 applied to a managed catalog table: the truncate-vs-recreate decision
  * made observable (mirrors /root/reference/tests/test_postgresql_loader.py
  * :197-265 — TRUNCATE path, DROP+CREATE path, new-table path).
  *
  * Every test seeds its own precondition table, so each passes in isolation
  * and under any suite ordering.
  */
class EvolutionTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark
  private val table = "evolution_spec_t"

  private def seed(): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val d = Sinks.applyEvolution(
      Seq((2020L, "asthma")).toDF("yearstart", "topic"), table)
    assert(d == Evolution.CreateNew)
  }

  override def afterAll(): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  test("absent table -> CreateNew; table materializes") {
    seed()
    assert(spark.table(table).count() == 1)
  }

  test("matching names (reordered) -> Truncate; DDL kept, aligned by name") {
    import spark.implicits._
    seed()
    val d = Sinks.applyEvolution(
      Seq(("diabetes", 2021L), ("obesity", 2022L)).toDF("topic", "yearstart"),
      table)
    assert(d == Evolution.Truncate)
    val out = spark.table(table)
    // table keeps its original column ORDER (DDL preserved)
    assert(out.columns.toSeq == Seq("yearstart", "topic"))
    assert(out.count() == 2) // old row wiped
    assert(out.filter(out("topic") === "diabetes")
      .head().getLong(0) == 2021L) // by-name alignment, not positional
  }

  test("name drift -> Recreate with the incoming schema") {
    import spark.implicits._
    seed()
    val d = Sinks.applyEvolution(
      Seq((2023L, "stroke", "US")).toDF("yearstart", "topic", "locationabbr"),
      table)
    assert(d == Evolution.Recreate)
    val out = spark.table(table)
    assert(out.columns.toSeq == Seq("yearstart", "topic", "locationabbr"))
    assert(out.count() == 1)
  }

  test("table identifiers are whitelisted (no SQL-text injection surface)") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("yearstart", "topic")
    intercept[IllegalArgumentException] {
      Sinks.applyEvolution(df, "t; DROP TABLE other")
    }
    intercept[IllegalArgumentException] {
      Sinks.applyEvolution(df, "bad-name")
    }
  }

  test("missing metadata columns are stamped on the Truncate path") {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Sinks.applyEvolution(Cleaning.withLoadMetadata(
      Seq((2020L, "asthma")).toDF("yearstart", "topic")), table)
    val d = Sinks.applyEvolution(
      Seq((2024L, "copd")).toDF("yearstart", "topic"), table)
    assert(d == Evolution.Truncate)
    val row = spark.table(table).head()
    assert(!row.isNullAt(row.fieldIndex("loaded_at")))
    assert(!row.isNullAt(row.fieldIndex("load_date")))
  }
}
