package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-chunk zone maps + row counts for [[ChunkCsvSource]].
  *
  * `index` is one executor-parallel Spark pass over the chunk dir (read
  * with the declared schema, grouped by `input_file_name`): per chunk, the
  * row count and min/max of each indexed column. The result is
  * O(chunks × columns) — at 2M chunks × a handful of indexed columns it
  * collects a few MB to the driver, the same order as parquet footer
  * metadata — and lands as a `_chunk_stats.csv` sidecar in the chunk dir
  * itself (leading underscore: invisible to [[ChunkCsv.listChunks]] and
  * to Spark's own file sources).
  *
  * The sidecar is RFC4180 CSV (`file,column,min,max`), written/read with
  * the connector's own [[Rfc4180]] tokenizer — the stats index for the
  * CSV source is itself CSV, so the whole staging tier stays one format
  * with zero serialization dependencies. Three row shapes:
  *
  *   - `chunk,col,lo,hi` — min/max as `CAST(x AS STRING)` of the declared
  *     type, re-parsed with the reader's own converters so planner-side
  *     comparisons happen in the column's real domain, never
  *     lexicographically on digit strings;
  *   - `chunk,col,,` (empty lo/hi) — the column is indexed and ALL-NULL
  *     in this chunk: comparisons and IS NOT NULL are unsatisfiable there;
  *   - `chunk,_rows,n,n` — the chunk's row count, which lets COUNT(*)
  *     (and the min/max aggregate pushdown) answer from metadata alone.
  *
  * Stats reflect the chunks at index time: [[ChunkCsvScan]] skips only
  * chunks present in the sidecar, and the aggregate pushdown engages only
  * when EVERY listed chunk is covered — chunks added after indexing are
  * scanned (correct, just unpruned); re-run `index` after appending.
  */
object ChunkStats {

  val SidecarName = "_chunk_stats.csv"
  val RowsKey = "_rows"

  /** Raw sidecar content: per chunk, per column, the stat strings as
    * written ((null, null) = indexed but all-null), plus row counts.
    */
  case class Sidecar(raw: Map[String, Map[String, (String, String)]],
      rows: Map[String, Long]) {

    /** Planner view: stats parsed into the comparison domain of `schema`.
      * A stat that fails to parse (e.g. the declared type changed since
      * indexing) is dropped — conservative, never wrong.
      */
    def canon(schema: StructType): Map[String, Map[String, (Any, Any)]] =
      raw.map { case (file, cols) =>
        file -> cols.flatMap { case (c, (lo, hi)) =>
          if (!schema.fieldNames.contains(c)) None
          else if (lo == null && hi == null) Some(c -> ((null, null)))
          else {
            val conv = ChunkCsvFilters.converter(schema(c).dataType)
            try Some(c -> ((ChunkCsvFilters.canon(conv(lo)),
              ChunkCsvFilters.canon(conv(hi)))))
            catch { case scala.util.control.NonFatal(_) => None }
          }
        }
      }

    def isEmpty: Boolean = raw.isEmpty && rows.isEmpty
  }

  /** Index `cols` (default: every atomic column) of the chunks in `dir`. */
  def index(spark: SparkSession, dir: String, schema: StructType,
      cols: Seq[String] = Nil): Unit = {
    val indexed = if (cols.nonEmpty) cols else schema.fields.collect {
      case f if ChunkCsvFilters.supported(
        org.apache.spark.sql.sources.IsNotNull(f.name),
        StructType(Seq(f))) => f.name
    }.toSeq
    // read through the connector itself, grouped by its _chunk metadata
    // column: the sidecar MUST share the data path's read semantics
    // (Spark's own CSV reader collapses quoted-empty strings to null,
    // which would skew string minima vs what the data path returns)
    val df = spark.read.format("chunkcsv").schema(schema).load(dir)
      .withColumn("_file", col(ChunkCsv.ChunkFileColumn))
    val aggs = count(lit(1)).as(RowsKey) +: indexed.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val rows = df.groupBy(col("_file")).agg(aggs.head, aggs.tail: _*)
      .collect() // O(chunks) rows — driver-sized by design, like footers
    val rowCounts = rows.map(r =>
      r.getString(0) -> r.getAs[Long](RowsKey)).toMap
    val raw = rows.map { r =>
      r.getString(0) -> indexed.map { c =>
        // all-null column in this chunk → (null, null)
        c -> ((r.getAs[String](s"min_$c"), r.getAs[String](s"max_$c")))
      }.toMap
    }.toMap
    write(dir, spark.sparkContext.hadoopConfiguration,
      Sidecar(raw, rowCounts), indexed)
  }

  /** Serialize a sidecar (shared by [[index]] and the writer's
    * stats-at-commit path). Files in sorted order — collect/map order
    * varies with partitioning, and a byte-deterministic sidecar lets
    * fixture digests diff clean; columns in `colOrder` (schema order),
    * any others trailing sorted.
    */
  def write(dir: String, conf: Configuration, sidecar: Sidecar,
      colOrder: Seq[String]): Unit = {
    val sb = new StringBuilder("file,column,min,max\n")
    val files = (sidecar.rows.keySet ++ sidecar.raw.keySet).toSeq.sorted
    val rank = colOrder.zipWithIndex.toMap
    files.foreach { file =>
      sidecar.rows.get(file).foreach { n =>
        sb.append(Seq(file, RowsKey, n.toString, n.toString)
          .map(quote).mkString(",")).append('\n')
      }
      val cols = sidecar.raw.getOrElse(file, Map.empty).toSeq
        .sortBy { case (c, _) => (rank.getOrElse(c, Int.MaxValue), c) }
      cols.foreach { case (c, (lo, hi)) =>
        sb.append(Seq(file, c, lo, hi).map(quote).mkString(","))
          .append('\n')
      }
    }
    val path = new Path(dir, SidecarName)
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def quote(s: String): String = Rfc4180.writeField(s)

  /** Load the sidecar. Missing sidecar → empty (nothing skippable, no
    * aggregate pushdown).
    */
  def load(dir: String, conf: Configuration): Sidecar = {
    val path = new Path(dir, SidecarName)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return Sidecar(Map.empty, Map.empty)
    val in = fs.open(path)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      val header = Rfc4180.read(reader)
      if (header == null) return Sidecar(Map.empty, Map.empty)
      val raw = scala.collection.mutable.Map
        .empty[String, Map[String, (String, String)]]
      val rows = scala.collection.mutable.Map.empty[String, Long]
      var rec = Rfc4180.read(reader)
      while (rec != null) {
        if (rec.length == 4 && rec(0) != null && rec(1) != null) {
          if (rec(1) == RowsKey) {
            try rows(rec(0)) = rec(2).toLong
            catch { case scala.util.control.NonFatal(_) => () }
          } else if ((rec(2) == null) == (rec(3) == null)) {
            raw(rec(0)) = raw.getOrElse(rec(0), Map.empty) +
              (rec(1) -> ((rec(2), rec(3))))
          }
        }
        rec = Rfc4180.read(reader)
      }
      Sidecar(raw.toMap, rows.toMap)
    } finally in.close()
  }
}
