package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-chunk zone maps for [[ChunkCsvSource]].
  *
  * `index` is one executor-parallel Spark pass over the chunk dir (read
  * with the declared schema, grouped by `input_file_name`): per chunk, the
  * min/max of each indexed column. The result is O(chunks × columns) —
  * at 2M chunks × a handful of indexed columns it collects a few MB to
  * the driver, the same order as parquet footer metadata — and lands as
  * a `_chunk_stats.csv` sidecar in the chunk dir itself (leading
  * underscore: invisible to [[ChunkCsv.listChunks]] and to Spark's own
  * file sources).
  *
  * The sidecar is RFC4180 CSV (`file,column,min,max`), written/read with
  * the connector's own [[Rfc4180]] tokenizer — the stats index for the
  * CSV source is itself CSV, so the whole staging tier stays one format
  * with zero serialization dependencies. Values are stored as
  * `CAST(x AS STRING)` of the declared column type and re-parsed with the
  * same converters the reader uses, so planner-side comparisons happen in
  * the column's real domain, never lexicographically on digit strings.
  *
  * Stats reflect the chunks at index time: [[ChunkCsvScan]] skips only
  * chunks present in the sidecar, so chunks added after indexing are
  * scanned (correct, just unpruned) — re-run `index` after appending.
  */
object ChunkStats {

  val SidecarName = "_chunk_stats.csv"

  /** Index `cols` (default: every atomic column) of the chunks in `dir`. */
  def index(spark: SparkSession, dir: String, schema: StructType,
      cols: Seq[String] = Nil): Unit = {
    val indexed = if (cols.nonEmpty) cols else schema.fields.collect {
      case f if ChunkCsvFilters.supported(
        org.apache.spark.sql.sources.IsNotNull(f.name),
        StructType(Seq(f))) => f.name
    }.toSeq
    // read through Spark's built-in CSV file source, not chunkcsv:
    // input_file_name() is only populated for file-based scans, and the
    // built-in reader needs multiLine to cross quoted newlines
    val df = spark.read.schema(schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").csv(dir)
      .withColumn("_file", element_at(split(input_file_name(), "/"), -1))
    val aggs = indexed.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val rows = df.groupBy(col("_file")).agg(aggs.head, aggs.tail: _*)
      .collect() // O(chunks) rows — driver-sized by design, like footers
    val sb = new StringBuilder("file,column,min,max\n")
    rows.foreach { r =>
      val file = r.getString(0)
      indexed.foreach { c =>
        val lo = r.getAs[String](s"min_$c")
        val hi = r.getAs[String](s"max_$c")
        if (lo != null && hi != null)
          sb.append(Seq(file, c, lo, hi).map(quote).mkString(",")).append('\n')
      }
    }
    val path = new Path(dir, SidecarName)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def quote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Load the sidecar for planning: chunk file name → column → (min, max)
    * as canonicalized comparison values. Missing sidecar → empty (no
    * chunk is skippable). A stat that fails to parse under the current
    * schema (e.g. the column's declared type changed since indexing) is
    * dropped — conservative, never wrong.
    */
  def load(dir: String, conf: Configuration, schema: StructType)
      : Map[String, Map[String, (Any, Any)]] = {
    val path = new Path(dir, SidecarName)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return Map.empty
    val in = fs.open(path)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      val header = Rfc4180.read(reader)
      if (header == null) return Map.empty
      val out = scala.collection.mutable.Map
        .empty[String, Map[String, (Any, Any)]]
      var rec = Rfc4180.read(reader)
      while (rec != null) {
        if (rec.length == 4 && rec.forall(_ != null) &&
            schema.fieldNames.contains(rec(1))) {
          val conv = ChunkCsvFilters.converter(schema(rec(1)).dataType)
          try {
            val lo = ChunkCsvFilters.canon(conv(rec(2)))
            val hi = ChunkCsvFilters.canon(conv(rec(3)))
            out(rec(0)) = out.getOrElse(rec(0), Map.empty) +
              (rec(1) -> ((lo, hi)))
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        rec = Rfc4180.read(reader)
      }
      out.toMap
    } finally in.close()
  }
}
