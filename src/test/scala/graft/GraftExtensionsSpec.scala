package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("vec_dot is callable from SQL text via SparkSessionExtensions") {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the JVM's SparkContext; new session state with extensions
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
      assert(r.getDouble(0) == 11.0)
      val nullCase = s2.sql(
        "SELECT vec_dot(array(1.0d, cast(null as double)), array(1.0d, 1.0d)) AS d")
        .head()
      assert(nullCase.isNullAt(0))
      // \u escapes keep the source ASCII: strip gets precomposed
      // e-acute; nfc gets base + combining acute and must recompose
      val txt = s2.sql(
        "SELECT strip_accents('caf\u00e9'), nfc_normalize('e\u0301')")
        .head()
      assert(txt.getString(0) == "cafe")
      assert(txt.getString(1) == "\u00e9")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
