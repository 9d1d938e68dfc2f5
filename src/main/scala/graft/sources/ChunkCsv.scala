package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's chunked-CSV staging tier.
  *
  * The reference stages its corpus as ≤50K-row header-bearing CSV chunks in
  * a bucket (`/root/reference/data_extractor.py:59,95-108`) and then reads
  * them back serially, chunk by chunk, parsing every column of every row
  * (`data_extractor.py:414-443`). This connector re-expresses that layout
  * as a first-class Spark source so the staging tier gets the same scan
  * economics as a columnar table:
  *
  *   - '''one InputPartition per chunk''' — the chunk grain the writer
  *     chose IS the parallelism grain; a 1000-executor cluster reads 1000
  *     chunks concurrently instead of the reference's serial loop;
  *   - '''required-column pruning''' ([[SupportsPushDownRequiredColumns]]):
  *     the reader tokenizes every field (CSV is row-major — unavoidable)
  *     but type-converts ONLY the columns the query needs, which is where
  *     CSV decode time actually goes;
  *   - '''predicate pushdown''' ([[SupportsPushDownFilters]]): simple
  *     comparisons are evaluated on the raw parsed record, before any
  *     InternalRow is built for Spark;
  *   - '''chunk skipping''': an optional per-chunk min/max sidecar
  *     (written by [[ChunkStats.index]]) gives the planner parquet-style
  *     zone maps — chunks whose [min,max] cannot satisfy a pushed filter
  *     are never opened. At 100 TB the staging dir is ~2M chunks; a date
  *     predicate over a date-clustered layout then opens only the
  *     qualifying sliver.
  *
  * Schema: pass one explicitly (`spark.read.schema(...)`) for typed reads —
  * the scalable single-pass path. Without one, [[inferSchema]] reads ONLY
  * the header line of the first chunk and types every column `STRING`,
  * mirroring the reference's TEXT-default type lattice
  * (`data_extractor.py:353`) without a data scan.
  *
  * Usage: `spark.read.format("chunkcsv").schema(s).load(dir)`.
  */
class ChunkCsvSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "chunkcsv"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = ChunkCsv.pathOf(options)
    val conf = new Configuration()
    val files = ChunkCsv.listChunks(dir, conf)
    // empty/fresh dir: no columns to infer — a WRITE is about to define
    // them (newWriteBuilder uses the query schema); a READ of nothing
    // yields an empty, zero-column frame
    if (files.isEmpty) return StructType(Nil)
    val in = files.head.getPath.getFileSystem(conf).open(files.head.getPath)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      val header = Rfc4180.read(reader)
      require(header != null, s"chunkcsv: empty chunk ${files.head.getPath}")
      StructType(header.map(name => StructField(name, StringType)))
    } finally in.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    ChunkCsvTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object ChunkCsv {

  /** Metadata column: which chunk file a row came from. */
  val ChunkFileColumn = "_chunk"

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "chunkcsv: 'path' option required (use .load(dir))")
    p
  }

  /** Commit-stamped chunk name, as minted by the transactional writer. */
  private[sources] val StampedName = "chunk-(\\d{13})-\\d{5}\\.csv".r

  /** Snapshot visibility for time-travel reads: with `asOf` set, a
    * commit-stamped chunk is visible iff its stamp <= asOf — the
    * append-only history IS the snapshot log (commit stamps are strictly
    * increasing by construction of the writer's stamp floor), so no
    * extra manifest is needed. Chunks with pre-scheme names (the
    * reference's `cdc_chunk_%04d.csv`, Spark's `part-*.csv`) carry no
    * commit order and stay visible at every snapshot — the same
    * never-skip posture as unindexed chunks.
    */
  def visibleAsOf(chunks: Array[FileStatus], asOf: Option[Long])
      : Array[FileStatus] = asOf match {
    case None => chunks
    case Some(s) => chunks.filter(st => st.getPath.getName match {
      case StampedName(t) => t.toLong <= s
      case _ => true
    })
  }

  /** Chunk files = the non-hidden, non-sidecar regular files of the dir.
    * Matches both the reference's `cdc_chunk_%04d.csv` names and Spark's
    * `part-*.csv` writer output.
    */
  def listChunks(dir: String, conf: Configuration): Array[FileStatus] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) Array.empty
    else fs.listStatus(path)
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .sortBy(_.getPath.getName)
  }
}

private[sources] case class ChunkCsvTable(tableSchema: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with SupportsMetadataColumns {

  override def schema(): StructType = tableSchema

  override def name(): String = s"chunkcsv(${ChunkCsv.pathOf(options)})"

  /** Writes take the QUERY's schema (a fresh dir has nothing to infer)
    * and run under the temp-file commit protocol in [[ChunkCsvBatchWrite]].
    */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val chunkRows = Option(info.options.get("chunkRows"))
      .orElse(Option(options.get("chunkRows"))).map(_.toInt)
      .getOrElse(50000)
    // indexStats: track per-file min/max/rowcount DURING the write and
    // commit the zone-map sidecar with the final chunk names — parquet's
    // footer economics (no ChunkStats.index re-read pass over the data)
    val indexStats = Option(info.options.get("indexStats"))
      .orElse(Option(options.get("indexStats"))).exists(_.toBoolean)
    new ChunkCsvWriteBuilder(ChunkCsv.pathOf(options), info.schema(),
      chunkRows, indexStats)
  }

  /** `_chunk` — the chunk file a row came from. Provenance is first-class
    * in the reference's staging model (chunk-numbered file names,
    * data_extractor.py:97-103), and it lets [[ChunkStats.index]] group by
    * chunk THROUGH this source, so sidecar stats share the exact
    * empty-vs-null read semantics of the data path (Spark's own CSV
    * reader collapses quoted-empty to null and would skew string minima).
    */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = ChunkCsv.ChunkFileColumn
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "name of the source chunk file"
    })

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(opts)
    new ChunkCsvScanBuilder(tableSchema, ChunkCsv.pathOf(options),
      new CaseInsensitiveStringMap(merged))
  }
}

/** Accumulates Catalyst's pushdown calls, then builds the scan.
  *
  * `pushFilters` keeps the conjuncts this source can evaluate exactly
  * (comparisons / null tests / IN on atomic columns, including ANDs of
  * those) and hands the rest back for Spark to evaluate post-scan. A kept
  * filter is gone from the query plan — the reader's row eval is the only
  * thing enforcing it, so [[ChunkCsvFilters.eval]] is correctness-critical
  * and spec-covered, not best-effort.
  */
private[sources] class ChunkCsvScanBuilder(schema: StructType, dir: String,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var required: StructType = schema
  private var pushed: Array[Filter] = Array.empty
  private var aggFold: Option[(Seq[ChunkAgg], Array[String])] = None
  private var limit: Option[Int] = None

  /** Time-travel read: only chunks committed at/below this stamp are
    * visible (`asOfStamp` read option, millis — the stamp embedded in
    * the chunk names the transactional writer minted).
    */
  private val asOfStamp: Option[Long] =
    Option(options.get("asOfStamp")).map(_.toLong)

  /** LIMIT reaches the readers (each stops after `n` emitted rows) and,
    * when the sidecar knows every chunk's row count and no filter is in
    * play, the planner itself (only enough chunks to cover `n` are
    * planned). Partial pushdown: Spark still applies the global limit.
    */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(ChunkCsvFilters.supported(_, schema))
    pushed = sup
    unsup
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Metadata-only aggregation: an ungrouped, unfiltered COUNT(*)/MIN/MAX
    * over indexed columns is answered from the sidecar without opening a
    * single chunk — the parquet-footer trick for the CSV staging tier. We
    * report PARTIAL pushdown (the scan emits one row of totals and Spark's
    * final agg merges it), which keeps the contract simple and correct.
    * Gate: no pushed filters, no grouping, and the sidecar covers EVERY
    * listed chunk for every referenced column (a post-index append must
    * fall back to a real scan, not a stale answer).
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return false
    // The sidecar fold sums EVERY indexed chunk — under a time-travel
    // read that would answer from the future. Snapshot reads take the
    // real (as-of-filtered) scan instead.
    if (asOfStamp.nonEmpty) return false
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 &&
        schema.fieldNames.contains(r.fieldNames.head) =>
        Some(r.fieldNames.head)
      case _ => None
    }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(ChunkAgg.RowCount)
      case m: Min => colOf(m.column).map(ChunkAgg.MinOf)
      case m: Max => colOf(m.column).map(ChunkAgg.MaxOf)
      case _ => None
    }
    if (specs.exists(_.isEmpty)) return false
    val flat = specs.flatten
    // coverage check (driver-side metadata read, like listing footers)
    val conf = new Configuration()
    val chunks = ChunkCsv.listChunks(dir, conf).map(_.getPath.getName)
    val sidecar = ChunkStats.load(dir, conf)
    val covered = chunks.forall { f =>
      sidecar.rows.contains(f) && flat.forall {
        case ChunkAgg.MinOf(c) => sidecar.raw.get(f).exists(_.contains(c))
        case ChunkAgg.MaxOf(c) => sidecar.raw.get(f).exists(_.contains(c))
        case ChunkAgg.RowCount => true
      }
    }
    if (!covered) return false
    // fold NOW: presence isn't parseability — a sidecar indexed under a
    // different declared type must veto this path (fall back to a real
    // scan), not throw at execution
    ChunkAgg.tryFold(sidecar, schema, flat) match {
      case Some(values) => aggFold = Some((flat, values)); true
      case None => false
    }
  }

  override def build(): Scan = aggFold match {
    case Some((specs, values)) => ChunkCsvAggScan(dir, schema, specs, values)
    case None => ChunkCsvScan(dir, schema, required, pushed, limit,
      Option(options.get("maxChunksPerTrigger")).map(_.toInt), asOfStamp)
  }
}

/** The aggregate specs the sidecar can answer. */
private[sources] sealed trait ChunkAgg
private[sources] object ChunkAgg {
  case object RowCount extends ChunkAgg
  case class MinOf(col: String) extends ChunkAgg
  case class MaxOf(col: String) extends ChunkAgg

  /** Fold the sidecar's raw stat strings into ONE raw value per spec —
    * min/max selected in the declared comparison domain (numeric for
    * numbers, UTF8String binary order for text — Spark's own min/max
    * ordering), never lexicographically on digit strings. Returns None
    * when any covered stat fails to parse under the declared type (a
    * stale sidecar indexed under a different schema): the caller must
    * then veto the metadata-aggregate path and fall back to a real scan
    * rather than throw at execution.
    */
  def tryFold(sidecar: ChunkStats.Sidecar, schema: StructType,
      specs: Seq[ChunkAgg]): Option[Array[String]] =
    try {
      Some(specs.map {
        case RowCount => sidecar.rows.values.sum.toString
        case MinOf(c) => extreme(sidecar, schema, c, wantMin = true)
        case MaxOf(c) => extreme(sidecar, schema, c, wantMin = false)
      }.toArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  private def extreme(sidecar: ChunkStats.Sidecar, schema: StructType,
      c: String, wantMin: Boolean): String = {
    val conv = ChunkCsvFilters.converter(schema(c).dataType)
    val cands = sidecar.raw.values.flatMap(_.get(c)).collect {
      case (lo, hi) if lo != null => if (wantMin) lo else hi
    }
    if (cands.isEmpty) null
    else {
      val ord: Ordering[String] =
        (a, b) => ChunkCsvFilters.cmp(conv(a), conv(b))
      if (wantMin) cands.min(ord) else cands.max(ord)
    }
  }
}

/** Metadata-only scan: one partition, one row, zero chunk files opened.
  * The totals were folded from the sidecar ON THE DRIVER at pushdown time
  * ([[ChunkAgg.tryFold]] — which also proved every stat parses, so this
  * scan can never throw on a stale sidecar) and ship to the single reader
  * as raw stat strings (the reader converts them with the same converters
  * a data read uses).
  */
private[sources] case class ChunkCsvAggScan(dir: String,
    fullSchema: StructType, specs: Seq[ChunkAgg], folded: Array[String])
    extends Scan with Batch {

  override def readSchema(): StructType = StructType(specs.map {
    case ChunkAgg.RowCount => StructField("count(*)", LongType, nullable = false)
    case ChunkAgg.MinOf(c) => StructField(s"min($c)", fullSchema(c).dataType)
    case ChunkAgg.MaxOf(c) => StructField(s"max($c)", fullSchema(c).dataType)
  })

  override def toBatch: Batch = this

  override def description(): String =
    s"ChunkCsvAgg[$dir] PushedAggregates: [${specs.mkString(", ")}]"

  // counted once per scan (planInputPartitions may be invoked repeatedly)
  private lazy val counted: Unit = ChunkCsvMetrics.metadataAggs.add(1L)

  override def planInputPartitions(): Array[InputPartition] = {
    counted
    Array(ChunkAggPartition(folded))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChunkAggReaderFactory(fullSchema, specs)
}

private[sources] case class ChunkAggPartition(values: Array[String])
    extends InputPartition

private[sources] case class ChunkAggReaderFactory(fullSchema: StructType,
    specs: Seq[ChunkAgg]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val values = partition.asInstanceOf[ChunkAggPartition].values
      private var emitted = false

      override def next(): Boolean = !emitted && { emitted = true; true }

      override def get(): InternalRow = {
        val row = new GenericInternalRow(specs.length)
        specs.zipWithIndex.foreach { case (spec, i) =>
          val raw = values(i)
          val v = spec match {
            case ChunkAgg.RowCount => raw.toLong
            case ChunkAgg.MinOf(c) =>
              if (raw == null) null
              else ChunkCsvFilters.converter(fullSchema(c).dataType)(raw)
            case ChunkAgg.MaxOf(c) =>
              if (raw == null) null
              else ChunkCsvFilters.converter(fullSchema(c).dataType)(raw)
          }
          row.update(i, v)
        }
        row
      }

      override def close(): Unit = ()
    }
}

/** The scan: plans one partition per surviving chunk.
  *
  * Planning happens on the driver: list the chunk files, load the min/max
  * sidecar if [[ChunkStats.index]] wrote one, and drop every chunk whose
  * stats prove no row can satisfy the pushed conjunction. `description()`
  * surfaces the pushed filters and read schema in `explain`, so plan specs
  * can pin that pruning/pushdown actually reached the source.
  */
private[sources] case class ChunkCsvScan(dir: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None, maxChunksPerTrigger: Option[Int] = None,
    asOfStamp: Option[Long] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Join-driven chunk skipping: Spark's runtime filtering (the DSv2 face
    * of dynamic partition pruning) hands this scan the join keys it
    * learned at execution time — e.g. an IN-set from a broadcast dim —
    * and the zone maps drop every chunk whose [min,max] excludes them.
    * Chunk-level only: Spark still evaluates the join itself, so an
    * over-approximate keep is merely unpruned work, never wrong.
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fields // Spark resolves these against the PRUNED output
      .filter(f => ChunkCsvFilters.supported(IsNotNull(f.name),
        StructType(Seq(f))))
      .map(f => org.apache.spark.sql.connector.expressions.Expressions
        .column(f.name))

  @volatile private var runtime: Array[Filter] = Array.empty

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter(ChunkCsvFilters.supported(_, fullSchema))

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // A stream pinned to a past snapshot would silently never advance —
    // fail loudly instead of ignoring the option.
    require(asOfStamp.isEmpty,
      "chunkcsv: asOfStamp is a batch-read option; streaming reads " +
        "follow the live chunk log")
    new ChunkCsvMicroBatchStream(dir, fullSchema, required, pushed,
      maxChunksPerTrigger)
  }

  override def description(): String =
    s"ChunkCsv[$dir] ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      asOfStamp.map(s => s", AsOfStamp: $s").getOrElse("")

  private lazy val statsCanon: Map[String, Map[String, (Any, Any)]] =
    ChunkStats.load(dir, new Configuration()).canon(fullSchema)

  private def zoneMapKeep(chunks: Array[FileStatus], fs: Array[Filter])
      : Array[FileStatus] =
    chunks.filter { st =>
      statsCanon.get(st.getPath.getName) match {
        case Some(colStats) =>
          fs.forall(ChunkCsvFilters.maySatisfy(_, colStats))
        case None => true // unindexed chunk: never skip
      }
    }

  private lazy val surviving: Array[FileStatus] = {
    val all = ChunkCsv.visibleAsOf(
      ChunkCsv.listChunks(dir, new Configuration()), asOfStamp)
    val keep = zoneMapKeep(all, pushed)
    ChunkCsvMetrics.plannedChunks.add(all.length)
    ChunkCsvMetrics.skippedChunks.add(all.length - keep.length)
    keep
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val rf = runtime
    val keep = if (rf.isEmpty) surviving else {
      val k = zoneMapKeep(surviving, rf)
      ChunkCsvMetrics.runtimeSkippedChunks.add(surviving.length - k.length)
      k
    }
    // plan-level LIMIT: with no predicates in play and sidecar row counts
    // for every surviving chunk, only enough chunks to cover the limit
    // are planned at all (readers cap their own rows either way)
    val planned = limit match {
      case Some(n) if pushed.isEmpty && rf.isEmpty =>
        val rows = ChunkStats.load(dir, new Configuration()).rows
        if (keep.forall(st => rows.contains(st.getPath.getName))) {
          var acc = 0L
          keep.takeWhile { st =>
            val take = acc < n
            acc += rows(st.getPath.getName)
            take
          }
        } else keep
      case _ => keep
    }
    planned.map(st => ChunkInputPartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChunkCsvReaderFactory(fullSchema, required, pushed, limit)

  /** Size of the surviving chunks — lets Catalyst make a sane broadcast
    * decision when a chunkcsv table sits on the small side of a join.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = surviving.map(_.getLen).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
}

private[sources] case class ChunkInputPartition(file: String)
    extends InputPartition

/** Streaming read of an accreting chunk dir — the reference's daily
  * arrival pattern (a new zero-padded `cdc_chunk_%04d.csv` per batch run,
  * data_extractor.py:97-103) as a Structured Streaming source.
  *
  * The offset is a chunk-NAME high watermark: a batch is "the chunks that
  * sort after the last processed name", so the contract is monotonic
  * chunk naming — exactly what the reference's zero-padded counter (and
  * any timestamped landing convention) provides. The watermark lives in
  * the query checkpoint, giving exactly-once chunk processing across
  * restarts with no side state of our own; `commit` is a no-op because
  * the watermark alone reconstructs any batch (offsets are replayable).
  *
  * Pushed filters and pruning apply per micro-batch, and zone-map chunk
  * skipping works mid-stream: a skipped chunk still advances the
  * watermark (it was processed — provably empty), it just never opens.
  */
private[sources] case class ChunkOffset(watermark: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = watermark
}

private[sources] class ChunkCsvMicroBatchStream(dir: String,
    fullSchema: StructType, required: StructType, pushed: Array[Filter],
    maxChunksPerTrigger: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  private val conf = new Configuration()

  override def initialOffset(): Offset = ChunkOffset("")

  override def deserializeOffset(json: String): Offset = ChunkOffset(json)

  override def latestOffset(): Offset = {
    val names = ChunkCsv.listChunks(dir, conf).map(_.getPath.getName)
    ChunkOffset(if (names.isEmpty) "" else names.max)
  }

  /** Admission control: cap chunks per micro-batch (`maxChunksPerTrigger`
    * read option) so a backlogged dir — say, a month of daily chunks after
    * an outage — catches up in bounded batches instead of one giant one.
    * A chunk maps to `ReadLimit.maxFiles`.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxChunksPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start match {
      case c: ChunkOffset => c.watermark
      case _ => ""
    }
    val pending = ChunkCsv.listChunks(dir, conf).map(_.getPath.getName)
      .filter(_ > lo).sorted
    val admitted = limit match {
      case f: ReadMaxFiles => pending.take(f.maxFiles())
      case _ => pending
    }
    ChunkOffset(if (admitted.isEmpty) lo else admitted.last)
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[ChunkOffset].watermark
    val hi = end.asInstanceOf[ChunkOffset].watermark
    val batch = ChunkCsv.listChunks(dir, conf).filter { st =>
      val n = st.getPath.getName
      n > lo && n <= hi
    }
    val stats = ChunkStats.load(dir, conf).canon(fullSchema)
    val keep = batch.filter { st =>
      stats.get(st.getPath.getName) match {
        case Some(colStats) =>
          pushed.forall(ChunkCsvFilters.maySatisfy(_, colStats))
        case None => true
      }
    }
    ChunkCsvMetrics.plannedChunks.add(batch.length)
    ChunkCsvMetrics.skippedChunks.add(batch.length - keep.length)
    keep.map(st =>
      ChunkInputPartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ChunkCsvReaderFactory(fullSchema, required, pushed)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private[sources] case class ChunkCsvReaderFactory(fullSchema: StructType,
    required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new ChunkCsvReader(
      partition.asInstanceOf[ChunkInputPartition].file,
      fullSchema, required, pushed, limit)
}

/** Streams one chunk: RFC4180 records → pushed-filter eval on the raw
  * fields → InternalRow with only the required columns converted.
  *
  * Column resolution is by header name, not position — chunks written at
  * different times may order columns differently (the reference's schema
  * evolution appends columns, data_extractor.py:414-443); a column missing
  * from a chunk's header reads as NULL, which is exactly Spark's
  * union-by-name drift semantics.
  */
private[sources] class ChunkCsvReader(file: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  ChunkCsvMetrics.openedChunks.add(1L)

  private val path = new Path(file)
  private val in = path.getFileSystem(new Configuration()).open(path)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8),
    1 << 16)

  // header name -> field index in this chunk's records
  private val headerIdx: Map[String, Int] = {
    val h = Rfc4180.read(reader)
    if (h == null) Map.empty else h.zipWithIndex.toMap
  }

  // (chunk field index | -1 missing | -2 _chunk metadata, converter)
  private val chunkName = UTF8String.fromString(path.getName)
  private val outCols: Array[(Int, String => Any)] =
    required.fields.map { f =>
      headerIdx.get(f.name) match {
        case Some(i) => (i, ChunkCsvFilters.converter(f.dataType))
        case None if f.name == ChunkCsv.ChunkFileColumn =>
          (-2, ChunkCsvFilters.converter(f.dataType))
        case None => (-1, ChunkCsvFilters.converter(f.dataType))
      }
    }

  // filter eval plan: for each pushed filter's referenced column, where it
  // sits in this chunk and how to canonicalize it for comparison
  private val filterCols: Map[String, (Int, String => Any)] =
    pushed.flatMap(_.references).distinct.map { name =>
      val dt = fullSchema(name).dataType
      name -> (headerIdx.getOrElse(name, -1), ChunkCsvFilters.converter(dt))
    }.toMap

  private var current: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false // pushed LIMIT: stop early
    var rec = Rfc4180.read(reader)
    while (rec != null) {
      if (passes(rec)) {
        current = convert(rec)
        emitted += 1
        return true
      }
      rec = Rfc4180.read(reader)
    }
    false
  }

  private def fieldAt(rec: Array[String], idx: Int): String =
    if (idx >= 0 && idx < rec.length) rec(idx) else null

  private def passes(rec: Array[String]): Boolean =
    pushed.forall { f =>
      ChunkCsvFilters.eval(f, name => {
        val (idx, conv) = filterCols(name)
        val raw = fieldAt(rec, idx)
        if (raw == null) null else conv(raw)
      })
    }

  private def convert(rec: Array[String]): InternalRow = {
    val row = new GenericInternalRow(outCols.length)
    var i = 0
    while (i < outCols.length) {
      val (idx, conv) = outCols(i)
      if (idx == -2) row.update(i, chunkName)
      else {
        val raw = fieldAt(rec, idx)
        row.update(i, if (raw == null) null else conv(raw))
      }
      i += 1
    }
    row
  }

  override def get(): InternalRow = current

  override def close(): Unit = reader.close()
}

/** Filter support / evaluation for the v1 `sources.Filter` algebra.
  *
  * Values are canonicalized before comparison: integral/date/timestamp/
  * boolean → Long, floating → Double, text → String — so a filter value
  * boxed as `Integer` compares correctly against a `LongType` column.
  * Comparison across the Long/Double kinds goes through BigDecimal
  * (exact, no silent precision loss on large longs).
  */
private[sources] object ChunkCsvFilters {

  def supported(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, v) => atomic(a, schema) && v != null
    case GreaterThan(a, v) => atomic(a, schema) && v != null
    case GreaterThanOrEqual(a, v) => atomic(a, schema) && v != null
    case LessThan(a, v) => atomic(a, schema) && v != null
    case LessThanOrEqual(a, v) => atomic(a, schema) && v != null
    case In(a, vs) => atomic(a, schema) && vs != null && vs.forall(_ != null)
    case IsNull(a) => atomic(a, schema)
    case IsNotNull(a) => atomic(a, schema)
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case _ => false // Or/Not/StartsWith/...: Spark evaluates post-scan
  }

  private def atomic(name: String, schema: StructType): Boolean =
    schema.fieldNames.contains(name) && (schema(name).dataType match {
      case _: StringType | _: LongType | _: IntegerType | _: ShortType |
           _: ByteType | _: DoubleType | _: FloatType | _: BooleanType |
           _: DateType | _: TimestampType | _: DecimalType => true
      case _ => false
    })

  /** CSV string → Catalyst value for the declared type. Unquoted-empty
    * fields arrive as Scala null (see [[Rfc4180]]) and never reach these.
    */
  def converter(dt: DataType): String => Any = dt match {
    case StringType => s => UTF8String.fromString(s)
    case LongType => s => s.trim.toLong
    case IntegerType => s => s.trim.toInt
    case ShortType => s => s.trim.toShort
    case ByteType => s => s.trim.toByte
    case DoubleType => s => s.trim.toDouble
    case FloatType => s => s.trim.toFloat
    case BooleanType => s => s.trim.toBoolean
    case DateType =>
      s => java.time.LocalDate.parse(s.trim).toEpochDay.toInt
    case TimestampType => s => parseTimestampMicros(s.trim)
    case d: DecimalType =>
      s => org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(s.trim), d.precision, d.scale)
    case other =>
      throw new IllegalArgumentException(s"chunkcsv: unsupported type $other")
  }

  /** Accepts the two shapes Spark's CSV writer emits (ISO-8601 with offset,
    * ISO local) plus the classic `yyyy-MM-dd HH:mm:ss[.f]`; locals are
    * pinned UTC, matching the suite's session timezone.
    */
  private def parseTimestampMicros(s: String): Long = {
    val instant =
      try java.time.OffsetDateTime.parse(s).toInstant
      catch {
        case _: java.time.format.DateTimeParseException =>
          val local =
            try java.time.LocalDateTime.parse(s)
            catch {
              case _: java.time.format.DateTimeParseException =>
                java.time.LocalDateTime.parse(s.replace(' ', 'T'))
            }
          local.toInstant(java.time.ZoneOffset.UTC)
      }
    instant.getEpochSecond * 1000000L + instant.getNano / 1000L
  }

  /** Canonical comparison domain: Long (integral/date/ts/bool), Double,
    * BigDecimal, or UTF8String. Text canonicalizes to UTF8String — NOT
    * java.lang.String — because sidecar min/max come from Spark's own
    * min/max, which order text by UTF-8 BINARY bytes (code points), while
    * String.compareTo orders by UTF-16 code units. The two disagree when
    * supplementary-plane chars (≥U+10000) mix with U+E000–U+FFFF, and a
    * zone map compared in the wrong order can silently skip a chunk that
    * holds matching rows.
    */
  def canon(v: Any): Any = v match {
    case null => null
    case u: UTF8String => u
    case s: String => UTF8String.fromString(s)
    case b: java.lang.Boolean => if (b) 1L else 0L
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
    case f: Float => f.toDouble
    case d: Double => d
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case d: java.math.BigDecimal => d
    case d: BigDecimal => d.bigDecimal
    case other =>
      throw new IllegalArgumentException(
        s"chunkcsv: incomparable filter value $other (${other.getClass})")
  }

  private[sources] def cmp(a: Any, b: Any): Int = (canon(a), canon(b)) match {
    case (x: UTF8String, y: UTF8String) => x.binaryCompare(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x, y) => toBig(x).compareTo(toBig(y))
  }

  private def toBig(v: Any): java.math.BigDecimal = v match {
    case l: Long => java.math.BigDecimal.valueOf(l)
    case d: Double => java.math.BigDecimal.valueOf(d)
    case b: java.math.BigDecimal => b
    case other =>
      throw new IllegalArgumentException(s"chunkcsv: non-numeric $other")
  }

  /** SQL three-valued logic collapsed to keep/drop: a comparison against
    * NULL is not-true, hence drop — identical to what Spark's own
    * post-scan Filter would do with the same predicate.
    */
  def eval(f: Filter, lookup: String => Any): Boolean = f match {
    case EqualTo(a, v) => nn(lookup(a), v)(cmp(_, _) == 0)
    case GreaterThan(a, v) => nn(lookup(a), v)(cmp(_, _) > 0)
    case GreaterThanOrEqual(a, v) => nn(lookup(a), v)(cmp(_, _) >= 0)
    case LessThan(a, v) => nn(lookup(a), v)(cmp(_, _) < 0)
    case LessThanOrEqual(a, v) => nn(lookup(a), v)(cmp(_, _) <= 0)
    case In(a, vs) =>
      val x = lookup(a); x != null && vs.exists(v => cmp(x, v) == 0)
    case IsNull(a) => lookup(a) == null
    case IsNotNull(a) => lookup(a) != null
    case And(l, r) => eval(l, lookup) && eval(r, lookup)
    case other =>
      throw new IllegalStateException(s"chunkcsv: unpushable filter $other")
  }

  private def nn(x: Any, v: Any)(p: (Any, Any) => Boolean): Boolean =
    x != null && v != null && p(x, v)

  /** Zone-map check: can ANY row of a chunk with these [min,max] stats
    * satisfy `f`? Conservative: unknown column / unparsable stat → true
    * (never skip). A (null, null) stat means "indexed and all-null in
    * this chunk": comparisons and IS NOT NULL are unsatisfiable there.
    * Non-null min/max ignore NULLs (they come from a Spark min/max agg),
    * so IS NULL can never prune a chunk.
    */
  def maySatisfy(f: Filter, stats: Map[String, (Any, Any)]): Boolean = {
    def bound(a: String)(p: (Any, Any) => Boolean): Boolean =
      stats.get(a) match {
        case Some((null, null)) => false // all-null: no comparison holds
        case Some((lo, hi)) => p(lo, hi)
        case None => true
      }
    f match {
      case EqualTo(a, v) =>
        bound(a)((lo, hi) => cmp(v, lo) >= 0 && cmp(v, hi) <= 0)
      case GreaterThan(a, v) => bound(a)((_, hi) => cmp(hi, v) > 0)
      case GreaterThanOrEqual(a, v) => bound(a)((_, hi) => cmp(hi, v) >= 0)
      case LessThan(a, v) => bound(a)((lo, _) => cmp(lo, v) < 0)
      case LessThanOrEqual(a, v) => bound(a)((lo, _) => cmp(lo, v) <= 0)
      case In(a, vs) => bound(a)((lo, hi) =>
        vs.exists(v => cmp(v, lo) >= 0 && cmp(v, hi) <= 0))
      case IsNotNull(a) => stats.get(a) match {
        case Some((null, null)) => false // provably all-null
        case _ => true
      }
      case And(l, r) => maySatisfy(l, stats) && maySatisfy(r, stats)
      case _ => true
    }
  }
}

/** Local-mode observability for the spec suite: counters live in the one
  * shared JVM (`local[*]`), so tests can assert "the date filter opened 3
  * of 8 chunks". On a real cluster these would be task-level
  * CustomMetrics; the planner-side counters (planned/skipped) are
  * driver-side and correct everywhere.
  */
object ChunkCsvMetrics {
  val plannedChunks = new java.util.concurrent.atomic.LongAdder
  val skippedChunks = new java.util.concurrent.atomic.LongAdder
  val runtimeSkippedChunks = new java.util.concurrent.atomic.LongAdder
  val openedChunks = new java.util.concurrent.atomic.LongAdder
  val metadataAggs = new java.util.concurrent.atomic.LongAdder

  def reset(): Unit = { plannedChunks.reset(); skippedChunks.reset()
    runtimeSkippedChunks.reset(); openedChunks.reset(); metadataAggs.reset() }
}

/** Streaming RFC4180 record reader.
  *
  * Hand-rolled (~60 lines) rather than borrowing Spark's univocity
  * internals: the grammar is tiny, the reader must distinguish
  * quoted-empty (`""` → empty string) from unquoted-empty (→ NULL) to
  * match Spark's CSV null semantics, and owning it keeps the connector
  * free of `private[sql]` surface.
  *
  * Contract: returns one record as `Array[String]` (null elements for
  * unquoted-empty fields), or `null` at end of stream. Handles quoted
  * fields containing commas, doubled quotes, and embedded CR/LF; accepts
  * both LF and CRLF record separators; tolerates a missing trailing
  * newline on the last record.
  */
private[sources] object Rfc4180 {

  /** Serialize one field under the convention [[read]] inverts: null →
    * unquoted empty, empty string → quoted empty, specials → quote-doubled.
    * (Rfc4180Props keeps an independent copy as the executable spec.)
    */
  def writeField(s: String): String =
    if (s == null) ""
    else if (s.isEmpty) "\"\""
    else if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def read(r: java.io.Reader): Array[String] = {
    var c = r.read()
    if (c == -1) return null
    val fields = new ArrayBuffer[String](16)
    val sb = new java.lang.StringBuilder(64)
    var quoted = false // current field was ever inside quotes

    def endField(): Unit = {
      fields += (if (!quoted && sb.length == 0) null else sb.toString)
      sb.setLength(0)
      quoted = false
    }

    while (c != -1) {
      if (c == '"' && sb.length == 0 && !quoted) {
        // quoted field: consume until the closing quote; `after` becomes
        // the first char past the quoted section (or -1 at EOF, which
        // also tolerates an unterminated quote)
        quoted = true
        var after = -2
        while (after == -2) {
          val q = r.read()
          if (q == -1) after = -1
          else if (q == '"') {
            val peek = r.read()
            if (peek == '"') sb.append('"') else after = peek
          } else sb.append(q.toChar)
        }
        c = after
        c match {
          case ',' => endField(); c = r.read()
          case '\r' =>
            val n = r.read(); if (n != '\n' && n != -1) sb.append(n.toChar)
            endField(); return fields.toArray
          case '\n' | -1 => endField(); return fields.toArray
          case other => sb.append(other.toChar); c = r.read() // malformed: keep
        }
      } else c match {
        case ',' => endField(); c = r.read()
        case '\r' =>
          val n = r.read(); if (n == '\n' || n == -1) { endField(); return fields.toArray }
          else { sb.append('\r'); c = n }
        case '\n' => endField(); return fields.toArray
        case ch => sb.append(ch.toChar); c = r.read()
      }
    }
    endField()
    fields.toArray
  }
}
