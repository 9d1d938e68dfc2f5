package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT point extraction for the reference's Geolocation column, which the
  * reference carries as opaque TEXT in the exact form `POINT (lon lat)`
  * (/root/reference/tests/test_api_extraction.py:29-31). Built-in regex
  * expressions — codegen'd, coercing (malformed → NULL, matching the
  * cleaning layer's errors='coerce' stance).
  */
object Wkt {

  private val PointRe = "^POINT \\((-?[0-9.]+) (-?[0-9.]+)\\)$"

  def pointLon(c: Column): Column =
    nullif(regexp_extract(c, PointRe, 1), lit("")).cast("double")

  def pointLat(c: Column): Column =
    nullif(regexp_extract(c, PointRe, 2), lit("")).cast("double")

  /** `POINT (lon lat)` → struct(lon, lat); malformed input → struct of
    * nulls.
    */
  def point(c: Column): Column =
    struct(pointLon(c).as("lon"), pointLat(c).as("lat"))
}
