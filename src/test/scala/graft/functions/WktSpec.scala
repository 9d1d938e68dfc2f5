package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WktSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("POINT (lon lat) parses to doubles; malformed coerces to null") {
    import spark.implicits._
    val df = Seq(
      "POINT (-85.30 37.64)",
      "POINT (0.5 -0.25)",
      "not a point",
      "POINT (x y)").toDF("geo")
    val out = df.select(
      Wkt.pointLon(col("geo")).as("lon"),
      Wkt.pointLat(col("geo")).as("lat")).collect()
    assert(out(0).getDouble(0) == -85.30 && out(0).getDouble(1) == 37.64)
    assert(out(1).getDouble(0) == 0.5 && out(1).getDouble(1) == -0.25)
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    assert(out(3).isNullAt(0) && out(3).isNullAt(1))
  }

  test("point() wraps as a struct column") {
    import spark.implicits._
    val r = Seq("POINT (1.5 2.5)").toDF("geo")
      .select(Wkt.point(col("geo")).as("p"))
      .select("p.lon", "p.lat").head()
    assert((r.getDouble(0), r.getDouble(1)) == ((1.5, 2.5)))
  }
}
