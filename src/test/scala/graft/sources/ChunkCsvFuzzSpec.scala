package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.engine.Sinks

/** Fuzz the chunkcsv tokenizer against the PRODUCTION writer.
  *
  * Rfc4180Props round-trips a hand-rolled writer — the same convention, but
  * not the code path gate fixtures take: those go through Spark's univocity
  * CSV writer (`Sinks.writeChunkedCsv`). The r9 gate flake
  * (`q_chunkcsv_scan`, a hash mismatch no rerun reproduced) was exactly the
  * class of bug this suite exists to catch deterministically: adversarial
  * text — quotes, bare CR, CRLF, multibyte, surrogate pairs — positioned to
  * straddle the reader's 64 KiB buffer and the chunk-file boundaries, at
  * 1/8/32 partitions, must round-trip EXACTLY (null vs empty included).
  */
class ChunkCsvFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType)))

  /** ~64 KiB of filler so the interesting char lands at the reader's
    * BufferedReader boundary (1 << 16 chars).
    */
  private val B = 1 << 16

  /** Deterministic adversarial corpus: handpicked boundary shapes first,
    * then seeded-random mixes of the hostile atoms.
    */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val handpicked: Seq[String] = Seq(
      null, "",
      " ", "  padded  ",
      "ends-with-cr\r", "\rstarts-with-cr", "\r", "mid\rcr",
      "crlf\r\nmid", "ends-crlf\r\n", "\r\n", "\n", "ends-lf\n",
      "q\"uote", "\"wrapped\"", "\"", "\"\"", "a,b,c", ",", ",,",
      "comma, \"quotes\"\r\nand both newlines\n",
      "é", "中文字段", "🎈", "🎈🎈🎈", "mixed🎈中é",
      " private-use vs 🚀 supplementary", // UTF-16 vs UTF-8 order bait
      "x" * (B - 2), "x" * (B - 1), "x" * B, "x" * (B + 1), // buffer straddle
      ("y" * (B - 1)) + "\r\n" + "tail", // CRLF split across buffer fills
      ("z" * (B - 1)) + "\"inner\"", // quote at the boundary
      ("w" * (B - 1)) + "\r", // bare CR at the boundary, last char
      "🎈" * (B / 4), // surrogate pairs across the boundary
      ("q" * (B - 1)) + ",") // delimiter at the boundary (quoted by writer)
    val atoms = Array(",", "\"", "\n", "\r", "\r\n", "\"\"", " ", "\t",
      "é", "中", "🎈", "a", "xyz", "0")
    val rnd = new scala.util.Random(seed)
    def randText(): String = {
      val len = rnd.nextInt(12)
      if (len == 0 && rnd.nextBoolean()) null
      else (0 until len).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }
    val all = handpicked ++
      (handpicked.size until n).map(_ => randText())
    all.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private def roundTrip(parts: Int, chunkRows: Int, seed: Long): Unit = {
    import scala.jdk.CollectionConverters._
    val want = corpus(seed, 600)
    val df = spark.createDataFrame(
      want.map { case (i, t) => Row(i, t) }.asJava, schema)
      .repartition(parts, col("id"))
    val dir = java.nio.file.Files.createTempDirectory("chunkcsv-fuzz").toString
    try {
      Sinks.writeChunkedCsv(df, dir, chunkRows)
      val got = spark.read.format("chunkcsv").schema(schema).load(dir)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1)))
        .toMap
      assert(got.size == want.size,
        s"row count: got ${got.size}, want ${want.size}")
      val bad = want.collect {
        case (k, v) if got.get(k) != Some(v) =>
          s"id=$k want=${render(v)} got=${got.get(k).map(render).orNull}"
      }
      assert(bad.isEmpty, s"${bad.size} mismatches:\n${bad.take(5).mkString("\n")}")
    } finally {
      Sinks.deleteRecursive(spark.sparkContext.hadoopConfiguration, dir)
    }
  }

  private def render(s: String): String =
    if (s == null) "NULL"
    else "\"" + s.take(40).flatMap {
      case '\r' => "\\r"
      case '\n' => "\\n"
      case c => c.toString
    } + (if (s.length > 40) s"...len=${s.length}" else "") + "\""

  test("univocity write → chunkcsv read is the identity, 1 partition") {
    roundTrip(parts = 1, chunkRows = 100, seed = 41L)
  }

  test("univocity write → chunkcsv read is the identity, 8 partitions") {
    roundTrip(parts = 8, chunkRows = 37, seed = 42L)
  }

  test("univocity write → chunkcsv read is the identity, 32 partitions") {
    roundTrip(parts = 32, chunkRows = 7, seed = 43L)
  }
}
