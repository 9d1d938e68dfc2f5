package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** StripAccents / NfcNormalize: interpreted-path unit tests (codegen would
  * otherwise mask nullSafeEval) plus one DataFrame round-trip so the
  * codegen'd path runs too. The q_text_normalize oracle separately pins
  * parity with DuckDB's strip_accents/nfc_normalize on fixture-derived
  * text.
  */
class TextExprsSpec extends AnyFunSuite {

  private def strip(s: String): Any =
    StripAccents(Literal(s)).eval(null)
  private def nfc(s: String): Any =
    NfcNormalize(Literal(s)).eval(null)

  test("strip_accents removes Latin diacritics") {
    assert(strip("café").toString == "cafe")
    assert(strip("áéíóú À ñç")
      .toString == "aeiou A nc")
  }

  test("strip_accents handles decomposed input identically") {
    // e + combining acute == precomposed é after stripping
    assert(strip("café").toString == "cafe")
  }

  test("strip_accents: ASCII fast path is identity (same object)") {
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("plain text")
    assert(TextNorm.stripAccents(in) eq in)
  }

  test("strip_accents leaves non-Latin scripts without marks intact") {
    assert(strip("中文 שלום").toString
      == "中文 שלום")
  }

  test("nfc_normalize recomposes combining sequences") {
    assert(nfc("é").toString == "é")
    assert(nfc("café au lait").toString == "café au lait")
  }

  test("nfc_normalize is identity on already-NFC text") {
    assert(nfc("café").toString == "café")
  }

  test("null propagates") {
    assert(StripAccents(Literal.create(null,
      org.apache.spark.sql.types.StringType)).eval(null) == null)
    assert(NfcNormalize(Literal.create(null,
      org.apache.spark.sql.types.StringType)).eval(null) == null)
  }

  test("codegen path: DataFrame round-trip strips and recomposes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Seq(("résumé", "é"), ("plain", "x"))
      .toDF("a", "b")
      .select(TextExprs.stripAccents(col("a")).as("sa"),
        TextExprs.nfcNormalize(col("b")).as("nb"))
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("resume", "é"), ("plain", "x")))
  }
}
