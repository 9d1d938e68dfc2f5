package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Sinks
import graft.sources.ChunkStats

/** Oracle-gated queries over the DSv2 chunked-CSV connector
  * ([[graft.sources.ChunkCsvSource]]).
  *
  * The pattern: materialize a fixture table as the reference's staging
  * layout (≤N-row header CSV chunks, data_extractor.py:59,95-108), read it
  * back through `format("chunkcsv")`, and aggregate — the DuckDB oracle
  * runs the same aggregate against the original parquet, so a value
  * mismatch anywhere in the tokenizer / type converters / filter eval /
  * chunk skipping fails the driver gate, not just a unit test.
  *
  * Both fixtures build once per (query, sf-dir) via [[Scratch.cached]];
  * the chunk layout is a pure function of the input table.
  */
object Connector {

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** documents as free-text chunks — the tokenizer's production workout
    * (quotes/commas/newlines inside `text` cross chunk lines).
    */
  private def docChunks(s: SparkSession, dir: String): String =
    Scratch.cached(s"chunkcsv-docs:$dir") { tmp =>
      val out = tmp + "/docs"
      Sinks.writeChunkedCsv(t(s, dir, "documents"), out, chunkRows = 2048)
      out
    }

  /** orders date-clustered into chunks + zone-map sidecar: the layout a
    * daily staging pipeline naturally produces (each day's load is its own
    * chunk run), which makes date predicates chunk-prunable.
    */
  private def orderChunks(s: SparkSession, dir: String): String =
    Scratch.cached(s"chunkcsv-orders:$dir") { tmp =>
      val out = tmp + "/orders"
      val clustered = t(s, dir, "orders")
        .repartitionByRange(8, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
      Sinks.writeChunkedCsv(clustered, out, chunkRows = 100000)
      ChunkStats.index(s, out, ordersSchema,
        Seq("o_orderdate", "o_orderkey"))
      out
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full DSv2 path on free text: pushed lang filter + pruned read
    // (text is tokenized but never converted), integer aggregates only →
    // byte-exact oracle compare.
    "q_chunkcsv_scan" -> ((s, dir) =>
      s.read.format("chunkcsv").schema(docsSchema).load(docChunks(s, dir))
        .filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          sum(col("n_chars")).as("sum_chars"))),

    // Zone-map path: the date predicate both filters rows AND skips whole
    // chunks at planning time (ChunkCsvSpec pins the skip count; this row
    // pins that skipping never changes the answer).
    "q_chunkcsv_skip" -> ((s, dir) =>
      s.read.format("chunkcsv").schema(ordersSchema)
        .load(orderChunks(s, dir))
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_key"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))),

    // Metadata-only aggregation: COUNT/MIN/MAX folded from the sidecar on
    // the driver — zero chunk files opened (ChunkCsvSpec pins the zero;
    // this row pins that the metadata answer equals the data answer).
    "q_chunkcsv_agg_meta" -> ((s, dir) =>
      s.read.format("chunkcsv").schema(ordersSchema)
        .load(orderChunks(s, dir))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"))),
  )

  val oracles: Map[String, String] = Map(

    "q_chunkcsv_scan" ->
      """SELECT source, count(*) AS n_docs, min(doc_id) AS first_doc,
        |  sum(n_chars) AS sum_chars
        |FROM documents WHERE lang = 'en' GROUP BY source""".stripMargin,

    "q_chunkcsv_skip" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  min(o_orderkey) AS min_key,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderstatus""".stripMargin,

    "q_chunkcsv_agg_meta" ->
      """SELECT count(*) AS n_orders, min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key, min(o_orderdate) AS first_date,
        |  max(o_orderdate) AS last_date
        |FROM orders""".stripMargin,
  )
}
