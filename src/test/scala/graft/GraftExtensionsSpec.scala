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

      // quantile_bucket: foldable grid evaluated at plan time
      val qb = s2.sql(
        "SELECT quantile_bucket(5.0d, array(2.0d, 4.0d, 8.0d)) AS b,\n" +
          "       quantile_bucket(1.0d, array(2.0d, 4.0d, 8.0d)) AS lo")
        .head()
      assert(qb.getLong(0) == 2L && qb.getLong(1) == 0L)
      // non-foldable grid must be rejected at analysis, not silently run
      val err = intercept[Exception](s2.sql(
        "SELECT quantile_bucket(x, array(x)) FROM (SELECT 1.0d AS x)")
        .head())
      assert(err.getMessage.contains("foldable"))

      // bloom_might_contain: build a real filter, probe via SQL literal
      import org.apache.spark.util.sketch.BloomFilter
      val bf = BloomFilter.create(100, 0.01)
      bf.putLong(42L); bf.putLong(7L)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val hex = bos.toByteArray.map("%02X".format(_)).mkString
      val probe = s2.sql(
        s"SELECT bloom_might_contain(42L, X'$hex') AS hit, " +
          s"bloom_might_contain(999999L, X'$hex') AS miss").head()
      assert(probe.getBoolean(0))
      // 0.01 fpp: a single fixed probe missing is overwhelmingly likely,
      // and determinism makes this stable run-to-run
      assert(!probe.getBoolean(1))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
