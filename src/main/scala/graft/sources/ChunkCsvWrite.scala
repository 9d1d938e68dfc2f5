package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Transactional chunk writes for [[ChunkCsvSource]].
  *
  * The reference's extractor writes chunks directly to their final names
  * (`data_extractor.py:95-108`) — a crash mid-run leaves a half-written
  * chunk that the next read ingests as truncated data. Here every task
  * writes to `_tmp-<uuid>` files and only the DRIVER's commit renames them
  * to their final names; abort deletes the temps, so readers never observe
  * a partial chunk — the same two-phase shape as Spark's file commit
  * protocol, scoped to this layout.
  *
  * Final names are `chunk-<commitMillis>-<seq>.csv`: zero-padded and
  * commit-stamped, so (a) lexicographic order is commit order, which is
  * exactly the monotonic-naming contract [[ChunkCsvMicroBatchStream]]
  * needs — an appended batch streams as the next micro-batch — and (b)
  * concurrent historical names never collide. Truncate (SaveMode.
  * Overwrite) deletes prior chunks AND the stats sidecar (now stale);
  * append leaves the sidecar, which is safe by construction — unindexed
  * chunks are never skipped and veto the metadata-aggregate path.
  *
  * Each task rolls to a new temp file every `chunkRows` rows (the `
  * chunkRows` write option, default 50000), preserving the reference's
  * ≤50K-row chunk contract no matter how rows are partitioned.
  */
private[sources] class ChunkCsvWriteBuilder(dir: String, schema: StructType,
    chunkRows: Int, indexStats: Boolean) extends WriteBuilder
    with SupportsTruncate {

  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ChunkCsvBatchWrite(dir, schema, chunkRows, truncateFirst,
        indexStats)
  }
}

/** Per-file write-time stats: row count + per-column raw min/max strings
  * (null/null = the column was all-null in this file), in the exact form
  * [[ChunkStats]] stores — the formatter output IS the `CAST(x AS STRING)`
  * domain the sidecar re-parses.
  */
private[sources] case class ChunkFileStats(rows: Long,
    cols: Seq[(String, String, String)])

private[sources] case class ChunkTempsMessage(tempPaths: Seq[String],
    stats: Seq[ChunkFileStats] = Seq.empty)
    extends WriterCommitMessage

private[sources] class ChunkCsvBatchWrite(dir: String, schema: StructType,
    chunkRows: Int, truncateFirst: Boolean, indexStats: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    ChunkCsvWriterFactory(dir, schema, chunkRows, indexStats)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    if (truncateFirst) {
      ChunkCsv.listChunks(dir, conf)
        .foreach(st => fs.delete(st.getPath, false))
      fs.delete(new Path(dirPath, ChunkStats.SidecarName), false)
    }
    val parts = messages.map {
      case m: ChunkTempsMessage => m
      case other => throw new IllegalStateException(s"bad message $other")
    }
    val temps = parts.flatMap(_.tempPaths)
    // Strictly-increasing stamp regardless of clock behavior: two commits
    // in the same millisecond must not collide, and a backwards clock step
    // must not mint names at or below the streaming watermark (appended
    // chunks that sort ≤ the watermark would never be streamed). Floor the
    // wall clock at maxExistingStamp+1, read from the surviving listing
    // (after any truncate).
    val maxExisting = ChunkCsv.listChunks(dir, conf)
      .map(_.getPath.getName)
      .collect { case ChunkCsv.StampedName(s) => s.toLong }
      .foldLeft(0L)(math.max)
    val stamp = math.max(System.currentTimeMillis(), maxExisting + 1L)
    val finalNames = temps.zipWithIndex.map { case (tmp, i) =>
      val name = f"chunk-$stamp%013d-$i%05d.csv"
      val target = new Path(dirPath, name)
      if (!fs.rename(new Path(tmp), target))
        throw new java.io.IOException(s"commit rename failed: $tmp -> $target")
      name
    }
    // Stats-at-write (the parquet-footer economics for the staging tier):
    // each task tracked per-file min/max/rowcount AS IT WROTE, so the
    // sidecar lands in the same commit with zero re-read — at 100 TB the
    // alternative is a second full pass over every chunk
    // (ChunkStats.index). Append MERGES into any existing sidecar; chunks
    // of a prior unindexed write stay unindexed, which the read path
    // already treats safely (never skipped, metadata aggregates vetoed).
    if (indexStats) {
      val perFile = finalNames.zip(parts.flatMap(_.stats))
      val existing =
        if (truncateFirst) ChunkStats.Sidecar(Map.empty, Map.empty)
        else ChunkStats.load(dir, conf)
      val rows = existing.rows ++
        perFile.map { case (n, s) => n -> s.rows }
      val raw = existing.raw ++ perFile.map { case (n, s) =>
        n -> s.cols.map { case (c, lo, hi) => c -> ((lo, hi)) }.toMap
      }
      ChunkStats.write(dir, conf, ChunkStats.Sidecar(raw, rows),
        schema.fieldNames.toSeq)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val fs = new Path(dir).getFileSystem(conf)
    messages.foreach {
      case ChunkTempsMessage(paths, _) =>
        paths.foreach(p => fs.delete(new Path(p), false))
      case _ => ()
    }
  }
}

private[sources] case class ChunkCsvWriterFactory(dir: String,
    schema: StructType, chunkRows: Int, indexStats: Boolean = false)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new ChunkCsvDataWriter(dir, schema, chunkRows, partitionId, taskId,
      indexStats)
}

private[sources] class ChunkCsvDataWriter(dir: String, schema: StructType,
    chunkRows: Int, partitionId: Int, taskId: Long,
    indexStats: Boolean = false)
    extends DataWriter[InternalRow] {

  private val conf = new Configuration()
  private val dirPath = new Path(dir)
  private val fs = dirPath.getFileSystem(conf)
  fs.mkdirs(dirPath)

  private val temps = scala.collection.mutable.ArrayBuffer.empty[String]
  private var out: java.io.Writer = _
  private var rowsInFile = 0

  private val header =
    schema.fieldNames.map(Rfc4180.writeField).mkString(",") + "\n"

  // ---- stats-at-write state (active only when indexStats) ----
  private val nCols = schema.fields.length
  private val fileStats =
    scala.collection.mutable.ArrayBuffer.empty[ChunkFileStats]
  private var statMin: Array[Any] = _ // canon-domain extremes
  private var statMax: Array[Any] = _
  private var statMinRaw: Array[String] = _ // the strings the sidecar stores
  private var statMaxRaw: Array[String] = _

  /** Catalyst value → the connector's canon comparison domain, read
    * natively from the row (no re-parse of the formatted string). Strings
    * clone the UTF8String — the input row's buffer is reused across rows.
    */
  private val canonGetters: Array[InternalRow => Any] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case StringType => (r: InternalRow) => r.getUTF8String(i).clone()
        case LongType => (r: InternalRow) => r.getLong(i)
        case IntegerType => (r: InternalRow) => r.getInt(i).toLong
        case ShortType => (r: InternalRow) => r.getShort(i).toLong
        case ByteType => (r: InternalRow) => r.getByte(i).toLong
        case DoubleType => (r: InternalRow) => r.getDouble(i)
        case FloatType => (r: InternalRow) => r.getFloat(i).toDouble
        case BooleanType => (r: InternalRow) => if (r.getBoolean(i)) 1L else 0L
        case DateType => (r: InternalRow) => r.getInt(i).toLong
        case TimestampType => (r: InternalRow) => r.getLong(i)
        case d: DecimalType => (r: InternalRow) =>
          r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
        case other => throw new IllegalArgumentException(
          s"chunkcsv write: unsupported type $other")
      }
    }

  private def resetStats(): Unit = {
    statMin = new Array[Any](nCols)
    statMax = new Array[Any](nCols)
    statMinRaw = new Array[String](nCols)
    statMaxRaw = new Array[String](nCols)
  }

  private def flushStats(): Unit = {
    fileStats += ChunkFileStats(rowsInFile.toLong,
      schema.fields.zipWithIndex.map { case (f, i) =>
        (f.name, statMinRaw(i), statMaxRaw(i)) // null/null = all-null file
      }.toSeq)
  }

  private def roll(): Unit = {
    if (out != null) {
      out.close()
      if (indexStats) flushStats()
    }
    if (indexStats) resetStats()
    val tmp = new Path(dirPath,
      s"_tmp-$partitionId-$taskId-${temps.length}-" +
        java.util.UUID.randomUUID().toString.take(8))
    temps += tmp.toString
    out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
    out.write(header)
    rowsInFile = 0
  }

  /** Catalyst value → the CSV text [[ChunkCsvFilters.converter]] inverts. */
  private val formatters: Array[InternalRow => String] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val get: InternalRow => String = f.dataType match {
        case StringType => r => r.getUTF8String(i).toString
        case LongType => r => r.getLong(i).toString
        case IntegerType => r => r.getInt(i).toString
        case ShortType => r => r.getShort(i).toString
        case ByteType => r => r.getByte(i).toString
        case DoubleType => r => r.getDouble(i).toString
        case FloatType => r => r.getFloat(i).toString
        case BooleanType => r => r.getBoolean(i).toString
        case DateType =>
          r => java.time.LocalDate.ofEpochDay(r.getInt(i).toLong).toString
        case TimestampType => r => {
          val micros = r.getLong(i)
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC).toString
        }
        case d: DecimalType =>
          r => r.getDecimal(i, d.precision, d.scale)
            .toJavaBigDecimal.toPlainString
        case other => throw new IllegalArgumentException(
          s"chunkcsv write: unsupported type $other")
      }
      (r: InternalRow) => if (r.isNullAt(i)) null else get(r)
    }

  override def write(row: InternalRow): Unit = {
    if (out == null || rowsInFile >= chunkRows) roll()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i < formatters.length) {
      if (i > 0) sb.append(',')
      val raw = formatters(i)(row)
      sb.append(Rfc4180.writeField(raw))
      if (indexStats && raw != null) {
        val v = canonGetters(i)(row)
        if (statMinRaw(i) == null || ChunkCsvFilters.cmp(v, statMin(i)) < 0) {
          statMin(i) = v; statMinRaw(i) = raw
        }
        if (statMaxRaw(i) == null || ChunkCsvFilters.cmp(v, statMax(i)) > 0) {
          statMax(i) = v; statMaxRaw(i) = raw
        }
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
    rowsInFile += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) {
      out.close()
      if (indexStats) flushStats()
      out = null
    }
    ChunkTempsMessage(temps.toSeq, if (indexStats) fileStats.toSeq else Seq.empty)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    temps.foreach(p => fs.delete(new Path(p), false))
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}
