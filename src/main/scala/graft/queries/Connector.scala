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
    *
    * The layout is PINNED: hash-repartition on `doc_id` + in-partition
    * sort, so the chunk files are byte-identical in every environment.
    * Without the pin, Spark's input-split partitioning decided the chunk
    * boundaries, which vary with core count / maxPartitionBytes — every
    * run tokenized DIFFERENT files, and any boundary-sensitive reader bug
    * surfaces as an unreproducible one-off hash mismatch (the r9 flake)
    * instead of a deterministic failure.
    */
  private def docChunks(s: SparkSession, dir: String): String =
    Scratch.cached(s"chunkcsv-docs:$dir") { tmp =>
      val out = tmp + "/docs"
      val pinned = t(s, dir, "documents")
        .repartition(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
      Sinks.writeChunkedCsv(pinned, out, chunkRows = 2048)
      out
    }

  /** documents written THROUGH the connector's own transactional writer
    * (`format("chunkcsv")`) — puts the commit/rename path under the same
    * DuckDB gate as the read path. Layout pinned like [[docChunks]];
    * `indexStats` makes the write commit its zone-map sidecar too, so the
    * write-time stats feed `q_chunkcsv_write_meta`'s metadata aggregates.
    */
  private def docChunksRoundtrip(s: SparkSession, dir: String): String =
    Scratch.cached(s"chunkcsv-docs-rt:$dir") { tmp =>
      val out = tmp + "/docs-rt"
      t(s, dir, "documents")
        .repartition(4, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.format("chunkcsv").option("chunkRows", "2048")
        .option("indexStats", "true")
        .mode("overwrite").save(out)
      out
    }

  /** orders date-clustered into chunks + zone-map sidecar: the layout a
    * daily staging pipeline naturally produces (each day's load is its own
    * chunk run), which makes date predicates chunk-prunable.
    *
    * Clustering is by HASH of the order year, not `repartitionByRange` —
    * range partitioning samples its boundaries from whatever input splits
    * the session derives, so chunk contents varied between 8- and 32-CPU
    * environments (caught by the r10 digest forensics). Hash-of-year is a
    * pure function of the data: deterministic everywhere.
    *
    * Hash buckets alone prune poorly, though — murmur3 coalesces years
    * {1995, 1997, 2001} into ONE bucket, whose [min,max] date range then
    * straddles any mid-range predicate (the r11 q_chunkcsv_skip residual:
    * one 19k-row chunk per bucket meant zone maps could skip only 1 of 5
    * chunks). The pruning granularity therefore comes from the
    * in-partition date sort + SMALL chunks: each bucket emits ~4 chunks
    * of contiguous date runs, so a date predicate skips every chunk that
    * sits wholly before the cut — still a pure function of the data.
    */
  private def orderChunks(s: SparkSession, dir: String): String =
    Scratch.cached(s"chunkcsv-orders:$dir") { tmp =>
      val out = tmp + "/orders"
      val clustered = t(s, dir, "orders")
        .repartition(8, year(col("o_orderdate")))
        .sortWithinPartitions("o_orderdate", "o_orderkey")
      Sinks.writeChunkedCsv(clustered, out, chunkRows = 8192)
      ChunkStats.index(s, out, ordersSchema,
        Seq("o_orderdate", "o_orderkey"))
      out
    }

  /** documents written as TWO transactional commits (even doc_ids, then
    * odd appended) — the time-travel fixture. Commit stamps are strictly
    * increasing by the writer's stamp floor, so the min stamp identifies
    * the first commit's snapshot regardless of wall-clock behavior.
    */
  private def docChunksTwoCommits(s: SparkSession, dir: String): String =
    Scratch.cached(s"chunkcsv-docs-2c:$dir") { tmp =>
      val out = tmp + "/docs-2c"
      def half(parity: Int, mode: String): Unit =
        t(s, dir, "documents").filter(col("doc_id") % 2 === parity)
          .repartition(4, col("doc_id"))
          .sortWithinPartitions("doc_id")
          .write.format("chunkcsv").option("chunkRows", "2048")
          .mode(mode).save(out)
      half(0, "overwrite")
      half(1, "append")
      out
    }

  private val stampedName = "chunk-(\\d{13})-\\d{5}\\.csv".r

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Time-travel read: snapshot the two-commit fixture AT ITS FIRST
    // COMMIT via the asOfStamp option — the append-only commit-stamped
    // chunk log IS the snapshot manifest. The oracle recomputes the
    // first commit's content predicate (even doc_ids) from the parquet
    // truth, so a chunk leaking across the snapshot boundary in either
    // direction is a hash mismatch.
    "q_chunkcsv_asof" -> ((s, dir) => {
      val path = docChunksTwoCommits(s, dir)
      val stamps = new java.io.File(path).listFiles()
        .map(_.getName)
        .collect { case stampedName(t) => t.toLong }
      // An empty corpus commits zero chunks — snapshot "before anything"
      // (stamp 0) instead of throwing on min of nothing.
      val asOf = if (stamps.isEmpty) 0L else stamps.min
      s.read.format("chunkcsv").schema(docsSchema)
        .option("asOfStamp", asOf.toString).load(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          sum(col("n_chars")).as("sum_chars"))
    }),

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

    // Write → read round trip through the connector's OWN writer: the
    // transactional temp-file/commit-rename path and its RFC4180 field
    // quoting (which, unlike univocity, always quotes bare CR) sit under
    // the DuckDB gate, not just ScalaTest. Per-language aggregates catch
    // any row lost, duplicated, or corrupted in flight.
    "q_chunkcsv_roundtrip" -> ((s, dir) =>
      s.read.format("chunkcsv").schema(docsSchema)
        .load(docChunksRoundtrip(s, dir))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))),

    // Stats-at-write under the gate: the metadata-only aggregate over the
    // writer-committed sidecar (zero chunks opened) must equal DuckDB over
    // the original parquet — wrong write-time min/max would fail the hash.
    "q_chunkcsv_write_meta" -> ((s, dir) =>
      s.read.format("chunkcsv").schema(docsSchema)
        .load(docChunksRoundtrip(s, dir))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"),
          min(col("lang")).as("first_lang"),
          max(col("source")).as("last_source"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))),
  )

  val oracles: Map[String, String] = Map(

    "q_chunkcsv_asof" ->
      """SELECT lang, count(*) AS n_docs, min(doc_id) AS first_doc,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 2 = 0 GROUP BY lang""".stripMargin,

    "q_chunkcsv_scan" ->
      """SELECT source, count(*) AS n_docs, min(doc_id) AS first_doc,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
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

    "q_chunkcsv_roundtrip" ->
      """SELECT lang, count(*) AS n_docs, min(doc_id) AS first_doc,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY lang""".stripMargin,

    "q_chunkcsv_write_meta" ->
      """SELECT count(*) AS n_docs, min(doc_id) AS min_doc,
        |  max(doc_id) AS max_doc, min(lang) AS first_lang,
        |  max(source) AS last_source, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents""".stripMargin,
  )

  /** Gate-flake forensics (the r9 `q_chunkcsv_scan` hash-fail left only a
    * bare hash to debug from): dump, unconditionally and cheaply,
    *
    *   1. a content digest of every chunk fixture file (name, bytes, md5)
    *      — separates fixture-BUILD nondeterminism from READ-path
    *      nondeterminism after the fact;
    *   2. the flaky query's aggregates re-grouped by `_chunk` provenance —
    *      a later mismatch localizes to the exact chunk file whose
    *      tokenization diverged.
    *
    * Written OUTSIDE the verify outDir (the driver sweeps that dir for
    * oracle results); failures here never fail the dump.
    */
  def writeDiagnostics(s: SparkSession, dir: String, diagDir: String): Unit = {
    val base = java.nio.file.Paths.get(diagDir)
    java.nio.file.Files.createDirectories(base)
    val fixtures = Seq(
      "docs" -> docChunks(s, dir),
      "orders" -> orderChunks(s, dir),
      "docs_rt" -> docChunksRoundtrip(s, dir))
    val lines = "fixture,file,bytes,md5" +:
      fixtures.flatMap { case (label, d) => digestLines(label, d) }
    java.nio.file.Files.writeString(
      base.resolve("chunk_fixtures.csv"), lines.mkString("", "\n", "\n"))
    s.read.format("chunkcsv").schema(docsSchema).load(docChunks(s, dir))
      .filter(col("lang") === "en")
      .groupBy(col("_chunk"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        sum(col("n_chars")).as("sum_chars"))
      .coalesce(1).write.mode("overwrite")
      .parquet(base.resolve("q_chunkcsv_scan_chunks").toString)
  }

  /** One digest line per regular file of `dir`, name-sorted — the unit the
    * fault-injection spec pins: a flipped byte anywhere changes exactly its
    * file's line, so a later fixture diff localizes to the damaged chunk.
    */
  private[queries] def digestLines(label: String, dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .sortBy(_.getName)
      .map(f => s"$label,${f.getName},${f.length},${md5File(f)}")
      .toSeq

  private def md5File(f: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = new java.io.FileInputStream(f)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }
}
