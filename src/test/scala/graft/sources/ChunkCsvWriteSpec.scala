package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The DSv2 write path: transactional temp-then-rename commits, typed
  * round trips through the connector's own reader, chunk-size rolling,
  * overwrite-truncate semantics, and append names that keep the streaming
  * source's monotonic contract.
  */
class ChunkCsvWriteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grade", DoubleType),
    StructField("flag", BooleanType),
    StructField("day", DateType),
    StructField("ts", TimestampType),
    StructField("note", StringType)))

  private def mkRows(ids: Range): Seq[Row] = ids.map { i =>
    Row(i.toLong, i * 1.5, i % 2 == 0,
      java.sql.Date.valueOf(f"2024-02-${i % 28 + 1}%02d"),
      java.sql.Timestamp.valueOf(f"2024-02-01 10:0${i % 6}:3${i % 9}.125"),
      if (i % 7 == 3) null
      else if (i % 7 == 4) ""
      else if (i % 7 == 5) "semi,colon \"and\"\nnewline"
      else s"note-$i")
  }

  private def df(ids: Range) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(mkRows(ids).asJava, schema)
  }

  test("write → read round-trips every type, rolling files at chunkRows") {
    val dir = java.nio.file.Files.createTempDirectory("chunkwrite").toString
    df(0 until 10).repartition(2)
      .write.format("chunkcsv").option("chunkRows", "3")
      .mode("overwrite").save(dir)
    val files = ChunkCsv.listChunks(dir, new org.apache.hadoop.conf.Configuration())
    assert(files.length == 4) // 2 partitions × ceil(5/3) rolls
    assert(files.forall(_.getPath.getName.matches("chunk-\\d{13}-\\d{5}\\.csv")))
    val back = spark.read.format("chunkcsv").schema(schema).load(dir)
    assert(back.collect().toSet == df(0 until 10).collect().toSet)
  }

  test("overwrite truncates old chunks and drops the stale sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("chunktrunc").toString
    df(0 until 6).write.format("chunkcsv").mode("overwrite").save(dir)
    ChunkStats.index(spark, dir, schema)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, ChunkStats.SidecarName)))
    df(100 until 103).write.format("chunkcsv").mode("overwrite").save(dir)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, ChunkStats.SidecarName)))
    val ids = spark.read.format("chunkcsv").schema(schema).load(dir)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(100L, 101L, 102L))
  }

  test("append adds chunks that sort after existing ones (stream contract)") {
    val dir = java.nio.file.Files.createTempDirectory("chunkappend").toString
    df(0 until 3).write.format("chunkcsv").mode("overwrite").save(dir)
    val before = ChunkCsv.listChunks(dir,
      new org.apache.hadoop.conf.Configuration()).map(_.getPath.getName)
    Thread.sleep(2) // commit stamps are millis; ensure a later stamp
    df(3 until 6).write.format("chunkcsv").mode("append").save(dir)
    val after = ChunkCsv.listChunks(dir,
      new org.apache.hadoop.conf.Configuration()).map(_.getPath.getName)
    val added = after.diff(before)
    assert(added.nonEmpty && added.forall(n => before.forall(_ < n)),
      s"appended names must sort after existing: $before vs $added")
    assert(spark.read.format("chunkcsv").schema(schema).load(dir)
      .count() == 6L)
  }

  test("asOfStamp time-travel: a snapshot read sees exactly the chunks " +
      "committed at/under the stamp, and vetoes the sidecar agg path") {
    val dir = java.nio.file.Files.createTempDirectory("chunkasof").toString
    df(0 until 3).write.format("chunkcsv").option("indexStats", "true")
      .mode("overwrite").save(dir)
    val conf = new org.apache.hadoop.conf.Configuration()
    def stamps = ChunkCsv.listChunks(dir, conf).map(_.getPath.getName)
      .collect { case ChunkCsv.StampedName(s) => s.toLong }
    val stamp1 = stamps.max
    Thread.sleep(2)
    df(3 until 8).write.format("chunkcsv").option("indexStats", "true")
      .mode("append").save(dir)
    assert(stamps.max > stamp1)
    def read(asOf: Long) = spark.read.format("chunkcsv").schema(schema)
      .option("asOfStamp", asOf.toString).load(dir)
    // Snapshot at commit 1: only the first batch.
    assert(read(stamp1).select("id").collect().map(_.getLong(0)).sorted
      .toSeq == (0L until 3L))
    // Snapshot at HEAD: everything; before any commit: nothing.
    assert(read(stamps.max).count() == 8L)
    assert(read(0L).count() == 0L)
    // COUNT under as-of must NOT come from the (full-history) sidecar:
    // the plan falls back to the real scan and counts the snapshot.
    val cnt = read(stamp1).agg(count(lit(1)))
    assert(cnt.head().getLong(0) == 3L)
    assert(!cnt.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    // Pre-scheme names carry no commit order: visible at any snapshot.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "cdc_chunk_0001.csv"),
      "id,grade,flag,day,ts,note\n" +
        "9000,1.5,true,2024-02-01,2024-02-01 10:00:30.125,legacy\n")
    assert(read(0L).count() == 1L)
    // Streaming refuses a snapshot pin instead of silently freezing
    // (the require fires on the stream thread — await its surfacing).
    val q = spark.readStream.format("chunkcsv").schema(schema)
      .option("asOfStamp", stamp1.toString).load(dir)
      .writeStream.format("memory").queryName("asof_refuse")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("asofck").toString)
      .start()
    val e = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(10000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("asOfStamp")), messages(e))
  }

  test("compact merges a drip-fed dir into full chunks, preserves every " +
      "row, refreshes the sidecar, and sweeps orphaned temps") {
    val dir = java.nio.file.Files.createTempDirectory("chunkcompact")
      .toString
    // Drip-feed: five tiny commits of 2 rows at chunkRows=1 → 10 chunks.
    (0 until 5).foreach { i =>
      df(i * 2 until i * 2 + 2).coalesce(1)
        .write.format("chunkcsv").option("chunkRows", "1")
        .option("indexStats", "true")
        .mode(if (i == 0) "overwrite" else "append").save(dir)
    }
    val expect = df(0 until 10).collect().toSet
    // An orphaned temp from a dead writer; swept, never read.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_tmp-dead"), "junk")
    assert(ChunkCsvMaintenance.sweepTemps(dir) == 1)
    val (before, after) =
      ChunkCsvMaintenance.compact(spark, dir, schema, chunkRows = 1000)
    assert(before == 10 && after == 1, s"$before -> $after")
    val back = spark.read.format("chunkcsv").schema(schema).load(dir)
    assert(back.collect().toSet == expect)
    // The rewritten sidecar still answers metadata aggregates with zero
    // chunk opens.
    val agg = back.agg(count(lit(1)), min(col("id")), max(col("id")))
    assert(agg.queryExecution.executedPlan.toString
      .contains("PushedAggregates: [RowCount"))
    assert(agg.head() == Row(10L, 0L, 9L))
    // Empty dir: a no-op, not a crash.
    val empty = java.nio.file.Files.createTempDirectory("chunkempty")
      .toString
    assert(ChunkCsvMaintenance.compact(spark, empty, schema) == ((0, 0)))
  }

  test("append after a clock step back still mints strictly-later names") {
    // Simulate the hazard: the dir's newest chunk carries a stamp AHEAD of
    // the wall clock (a backwards clock step, or a same-millisecond pair).
    // The commit must floor its stamp at maxExisting+1 — names at or below
    // the streaming watermark would never be streamed.
    val dir = java.nio.file.Files.createTempDirectory("chunkclock").toString
    val future = 9000000000000L // year ~2255, far ahead of any test clock
    val planted = f"chunk-$future%013d-00000.csv"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, planted),
      "id,grade,flag,day,ts,note\n" +
        "99,1.5,true,2024-02-01,2024-02-01T10:00:30.125,planted\n")
    df(0 until 3).write.format("chunkcsv").mode("append").save(dir)
    val names = ChunkCsv.listChunks(dir,
      new org.apache.hadoop.conf.Configuration()).map(_.getPath.getName)
    val added = names.filterNot(_ == planted)
    assert(added.nonEmpty && added.forall(_ > planted),
      s"appended names must sort after the planted future stamp: $names")
    assert(spark.read.format("chunkcsv").schema(schema).load(dir)
      .count() == 4L)
  }

  test("no temp files survive a committed write") {
    val dir = java.nio.file.Files.createTempDirectory("chunktemps").toString
    df(0 until 6).write.format("chunkcsv").mode("overwrite").save(dir)
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_tmp-")).toSeq
    assert(leftovers.isEmpty, s"stranded temps: $leftovers")
  }

  test("indexStats write commits a sidecar: metadata aggs, zero opens") {
    val dir = java.nio.file.Files.createTempDirectory("chunkstats").toString
    df(0 until 20).repartition(2)
      .write.format("chunkcsv")
      .option("chunkRows", "4").option("indexStats", "true")
      .mode("overwrite").save(dir)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, ChunkStats.SidecarName)))
    val back = spark.read.format("chunkcsv").schema(schema).load(dir)
    ChunkCsvMetrics.reset()
    val r = back.agg(count(lit(1)), min(col("id")), max(col("id")),
      min(col("ts")), max(col("ts")), min(col("note")), max(col("note")))
      .collect().head
    assert(ChunkCsvMetrics.metadataAggs.sum() == 1L)
    assert(ChunkCsvMetrics.openedChunks.sum() == 0L) // sidecar answered
    assert(r.getLong(0) == 20L && r.getLong(1) == 0L && r.getLong(2) == 19L)
    assert(r.getTimestamp(3) ==
      java.sql.Timestamp.valueOf("2024-02-01 10:00:30.125"))
    // write-time stats must agree with a post-hoc data-pass index in the
    // PARSED comparison domain (raw text may differ — e.g. ISO 'T' vs
    // Spark-cast space in timestamps — but canon values must be equal)
    val conf = new org.apache.hadoop.conf.Configuration()
    val atWrite = ChunkStats.load(dir, conf)
    ChunkStats.index(spark, dir, schema)
    val rescanned = ChunkStats.load(dir, conf)
    assert(atWrite.rows == rescanned.rows)
    assert(atWrite.canon(schema) == rescanned.canon(schema),
      "stats-at-write diverged from the data pass")
  }

  test("indexStats write enables zone-map skipping immediately") {
    val dir = java.nio.file.Files.createTempDirectory("chunkzm").toString
    // one partition, id-sorted → chunkRows=5 gives 4 id-clustered chunks
    df(0 until 20).repartition(1).sortWithinPartitions("id")
      .write.format("chunkcsv")
      .option("chunkRows", "5").option("indexStats", "true")
      .mode("overwrite").save(dir)
    ChunkCsvMetrics.reset()
    val n = spark.read.format("chunkcsv").schema(schema).load(dir)
      .filter(col("id") >= 15L).count()
    assert(n == 5L)
    assert(ChunkCsvMetrics.skippedChunks.sum() == 3L)
    assert(ChunkCsvMetrics.openedChunks.sum() == 1L)
  }

  test("indexStats append merges the sidecar and keeps full coverage") {
    val dir = java.nio.file.Files.createTempDirectory("chunkmerge").toString
    df(0 until 6).write.format("chunkcsv")
      .option("indexStats", "true").mode("overwrite").save(dir)
    df(6 until 10).write.format("chunkcsv")
      .option("indexStats", "true").mode("append").save(dir)
    val back = spark.read.format("chunkcsv").schema(schema).load(dir)
    ChunkCsvMetrics.reset()
    val r = back.agg(count(lit(1)), min(col("id")), max(col("id")))
      .collect().head
    // every chunk covered → the merged sidecar still answers from metadata
    assert(ChunkCsvMetrics.metadataAggs.sum() == 1L)
    assert(ChunkCsvMetrics.openedChunks.sum() == 0L)
    assert(r.getLong(0) == 10L && r.getLong(1) == 0L && r.getLong(2) == 9L)
  }

  test("written chunks stream through the micro-batch source") {
    val dir = java.nio.file.Files.createTempDirectory("chunkwstream").toString
    df(0 until 4).write.format("chunkcsv").mode("overwrite").save(dir)
    val q = spark.readStream.format("chunkcsv").schema(schema).load(dir)
      .writeStream.format("memory").queryName("chunkwritten").start()
    try {
      q.processAllAvailable()
      assert(spark.table("chunkwritten").count() == 4L)
      Thread.sleep(2)
      df(4 until 7).write.format("chunkcsv").mode("append").save(dir)
      q.processAllAvailable()
      assert(spark.table("chunkwritten").count() == 7L)
    } finally q.stop()
  }
}
