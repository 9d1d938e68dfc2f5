package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck law for the hand-rolled RFC4180 tokenizer: any table of
  * fields — nulls, empties, quotes, commas, bare CR, LF, CRLF, unicode —
  * serialized under the writer convention (null → unquoted empty, "" →
  * quoted empty, specials → quote-doubled) parses back EXACTLY. This is
  * the pure-function mirror of ChunkCsvSpec's Spark-writer round trip.
  */
object Rfc4180Props extends Properties("Rfc4180") {

  // the same convention ChunkStats.quote / Spark's escaped writer emit
  private def writeField(s: String): String =
    if (s == null) ""
    else if (s.isEmpty) "\"\""
    else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def writeTable(rows: List[List[String]]): String =
    rows.map(_.map(writeField).mkString(",") + "\n").mkString

  private val specialGen: Gen[String] = Gen.oneOf(
    ",", "\"", "\n", "\r", " ", "é", "中",
    "🎈" /* surrogate-pair emoji */)

  private val fieldGen: Gen[String] = Gen.frequency(
    2 -> Gen.const(null),
    2 -> Gen.const(""),
    3 -> Gen.alphaNumStr,
    4 -> Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), specialGen)).map(_.mkString))

  private val tableGen: Gen[List[List[String]]] = for {
    cols <- Gen.chooseNum(1, 6)
    rows <- Gen.chooseNum(0, 8)
    table <- Gen.listOfN(rows, Gen.listOfN(cols, fieldGen))
  } yield table

  property("write → read is the identity on tables") =
    Prop.forAll(tableGen) { rows =>
      val reader = new java.io.StringReader(writeTable(rows))
      val parsed = Iterator.continually(Rfc4180.read(reader))
        .takeWhile(_ != null).map(_.toList).toList
      parsed == rows
    }
}
