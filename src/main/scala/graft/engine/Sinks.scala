package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Writers (SURVEY §2.1 S2, S5-S7, S9, S11).
  *
  * The reference's three sinks (chunked CSV to GCS, batched INSERTs to
  * PostgreSQL, replace-then-append BigQuery loads) become declarative writes:
  *
  *   - chunking        → `maxRecordsPerFile` (executors split files; no
  *                       driver-side `iloc` slicing, data_extractor.py:206-217)
  *   - replace+append  → ONE atomic `mode(Overwrite)` job (fixes the partial-
  *                       load hazard of data_loader.py:429-433)
  *   - cleanup         → Hadoop FS recursive delete (data_extractor.py:137-149)
  *
  * Scale note: writes are executor-parallel and commit-protocol atomic.
  * Partitioning the analytics table by `load_date` (the column the reference
  * stamps per load) gives free partition pruning for daily queries.
  */
object Sinks {

  /** Reference S2: slice into ≤`chunkRows`-row CSV files with headers.
    *
    * `escape = "` makes embedded quotes come out RFC4180-doubled (`""`)
    * instead of univocity's default backslash escape, so any standards-
    * compliant consumer — including [[graft.sources.ChunkCsvSource]] —
    * round-trips text containing quotes/commas/newlines byte-exactly.
    * The ignore-whitespace flags default TRUE on write and would silently
    * trim field edges: whitespace is data here — the reference's own
    * cleaning trims it explicitly LATER, in the load stage
    * (data_loader.py:325-333), and a staging tier that pre-trims would
    * make that pass unobservable.
    */
  def writeChunkedCsv(df: DataFrame, dir: String, chunkRows: Int = 50000): Unit =
    df.write
      .option("header", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("maxRecordsPerFile", chunkRows.toLong)
      .mode(SaveMode.Overwrite)
      .csv(dir)

  /** Atomic truncate-and-reload (reference S9 semantics, one job). */
  def overwriteParquet(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dir)

  /** ORC twin of [[overwriteParquet]] (see Sources.readOrc). */
  def overwriteOrc(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(dir)

  /** Analytics write partitioned by load_date → partition pruning for the
    * daily-refresh access pattern (SURVEY §4.2).
    */
  def overwritePartitioned(df: DataFrame, dir: String,
      partitionCol: String = "load_date"): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(dir)

  def appendParquet(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Append).parquet(dir)

  /** Reference S6: JDBC batch sink — the `execute_values(page_size=1000)`
    * insert loop (data_extractor.py:379-412) as a declarative executor-
    * parallel write; `batchsize` maps the page size. Overwrite mode gives
    * the truncate-and-reload semantics in one atomic job.
    */
  def jdbcBatchSink(df: DataFrame, url: String, table: String,
      batchSize: Int = 1000, mode: SaveMode = SaveMode.Append,
      properties: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode(mode).option("batchsize", batchSize.toLong)
      .jdbc(url, table, properties)

  /** JSON-Lines sink (one JSON object per line, executor-parallel files) —
    * the corpus export format downstream training stacks consume.
    */
  def writeJsonl(df: DataFrame, dir: String,
      maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).json(dir)
  }

  /** Reference S11: failed-validation rows → audit CSV. */
  def writeAuditCsv(badRows: DataFrame, path: String): Unit =
    badRows.write.option("header", "true").mode(SaveMode.Overwrite).csv(path)

  /** Reference S7 on a managed catalog table: compute the schema-evolution
    * decision and apply it —
    *
    *   - CreateNew / Recreate → drop-and-create from the incoming schema
    *     (one atomic overwrite write);
    *   - Truncate → KEEP the existing DDL (column order and types), wipe
    *     rows, and insert aligned BY NAME, like the reference's
    *     `INSERT INTO t (cols…)` (a positional insertInto would misassign
    *     reordered columns).
    *
    * Returns the decision taken so callers can report it (the observable
    * policy the reference logs at data_extractor.py:314-377).
    */
  def applyEvolution(df: DataFrame, tableName: String): Evolution.Decision = {
    // Identifier whitelist (SURVEY §7.4): the reference interpolates table
    // names into SQL f-strings (data_extractor.py:326,362-365), an
    // injection surface we do NOT replicate — the one SQL-text statement
    // below only ever sees a validated identifier.
    require(tableName.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"),
      s"invalid table identifier: $tableName")
    val spark = df.sparkSession
    val existing =
      if (spark.catalog.tableExists(tableName))
        Some(spark.table(tableName).schema)
      else None
    val decision = Evolution.plan(existing, df.schema)
    decision match {
      case Evolution.Truncate =>
        import org.apache.spark.sql.functions._
        val dfCols = df.columns.toSet
        // align by NAME in table order; metadata columns the incoming frame
        // lacks get stamped (the reference's DDL defaults) — only those can
        // be absent, namesMatch ignores nothing else
        val aligned = existing.get.fields.toIndexedSeq.map { f =>
          if (dfCols(f.name)) col(f.name)
          else if (f.name == "loaded_at")
            current_timestamp().cast(f.dataType).as(f.name)
          else current_date().cast(f.dataType).as(f.name)
        }
        // ONE overwrite insert, not TRUNCATE-then-append: a separate
        // committed TRUNCATE would leave the table empty if the insert job
        // then failed; insertInto(Overwrite) keeps the DDL and swaps the
        // rows in a single staged-commit job
        df.select(aligned: _*).write.mode(SaveMode.Overwrite)
          .insertInto(tableName)
      case _ =>
        df.write.mode(SaveMode.Overwrite).saveAsTable(tableName)
    }
    decision
  }

  /** Bucketed managed-table write: co-locates rows by `bucketCol` so
    * repeated joins/aggregations on that key skip their shuffle entirely
    * (the plan shows no Exchange on the bucketed side). The 100 TB pattern
    * for fact⋈fact joins that recur every load: pay the partitioning once
    * at write, amortize over every downstream join.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Reference S5: transient cleanup via Hadoop FS (works for any scheme —
    * file://, hdfs://, gs:// — the URI picks the implementation).
    */
  def deleteRecursive(df: DataFrame, path: String): Boolean =
    deleteRecursive(df.sparkSession.sparkContext.hadoopConfiguration, path)

  /** Session-free variant — usable from shutdown hooks where the Spark
    * session may already be stopping.
    */
  def deleteRecursive(conf: org.apache.hadoop.conf.Configuration,
      path: String): Boolean = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    hPath.getFileSystem(conf).delete(hPath, true)
  }
}
