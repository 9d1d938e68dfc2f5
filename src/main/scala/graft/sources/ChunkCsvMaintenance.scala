package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Maintenance operations for chunkcsv staging dirs.
  *
  * Small-files compaction — THE staging-tier pathology at scale: a
  * drip-fed ingest (one micro-batch per trigger, one API page per task)
  * leaves a directory of thousands of sub-size chunks whose per-file
  * open/seek overhead dominates every later scan, and whose sidecar rows
  * grow with file count, not data. `compact` rewrites the directory's
  * full content through the connector's own transactional writer at the
  * target chunk size, in ONE Spark job.
  *
  * In-place safety rides on the writer's two-phase commit: every task
  * writes `_tmp-*` files first, and only the driver-side commit deletes
  * the old chunks and renames the temps in — the source chunks are fully
  * read (and, with the repartition, materialized in the exchange) before
  * any byte of the old layout is touched, so a crash at ANY point leaves
  * either the old complete layout (commit never ran) or the new complete
  * layout, never a mix.
  *
  * Snapshot note: compaction rewrites history — the compacted data
  * carries ONE fresh commit stamp, so `asOfStamp` reads at pre-compaction
  * stamps see only chunks that survived (none). That is the documented
  * Delta/Iceberg trade too (VACUUM invalidates time travel past the
  * horizon); compact when snapshots older than the rewrite are
  * expendable.
  */
object ChunkCsvMaintenance {

  /** Compact `dir` to `chunkRows`-sized chunks. Returns
    * (chunksBefore, chunksAfter). The target partition count comes from
    * the total row count — answered from the sidecar WITHOUT opening a
    * chunk when the dir is fully indexed (the metadata-aggregate path) —
    * so the rewrite is sized to emit full chunks instead of
    * partition-count × ragged tails.
    */
  def compact(s: SparkSession, dir: String, schema: StructType,
      chunkRows: Int = 50000, indexStats: Boolean = true): (Int, Int) = {
    require(chunkRows > 0, s"chunkRows must be positive, got $chunkRows")
    val conf = new Configuration()
    val before = ChunkCsv.listChunks(dir, conf).length
    if (before == 0) return (0, 0)
    val src = s.read.format("chunkcsv").schema(schema).load(dir)
    val rows = src.count()
    val parts = math.max(1L, (rows + chunkRows - 1L) / chunkRows)
      .min(Int.MaxValue.toLong).toInt
    src.repartition(parts)
      .write.format("chunkcsv")
      .option("chunkRows", chunkRows.toString)
      .option("indexStats", indexStats.toString)
      .mode("overwrite").save(dir)
    (before, ChunkCsv.listChunks(dir, conf).length)
  }

  /** Orphaned-temp sweep: `_tmp-*` files left by a writer that died
    * BEFORE its driver could run abort(). They are invisible to readers
    * (underscore prefix) but hold space forever; any moment with no
    * writer in flight is safe to sweep. Returns the number removed.
    */
  def sweepTemps(dir: String): Int = {
    val conf = new Configuration()
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return 0
    val temps = fs.listStatus(path).filter(st =>
      st.isFile && st.getPath.getName.startsWith("_tmp-"))
    temps.foreach(st => fs.delete(st.getPath, false))
    temps.length
  }
}
