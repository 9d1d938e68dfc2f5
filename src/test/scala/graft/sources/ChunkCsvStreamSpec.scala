package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming reads of an accreting chunk dir: each arriving chunk is one
  * micro-batch increment, processed exactly once, surviving a query
  * restart from the checkpointed name watermark.
  */
class ChunkCsvStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def writeChunk(dir: String, n: Int, ids: Seq[Long]): Unit = {
    val body = "id,v\n" + ids.map(i => s"$i,v-$i\n").mkString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, f"chunk-$n%04d.csv"), body.getBytes)
  }

  test("arriving chunks stream exactly once and survive a restart") {
    val dir = java.nio.file.Files.createTempDirectory("chunkstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("chunkckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("chunksink").toString
    writeChunk(dir, 1, Seq(1L, 2L))
    writeChunk(dir, 2, Seq(3L))

    // parquet sink: the sink whose exactly-once contract actually exercises
    // checkpoint recovery (the memory sink refuses to recover)
    def start() = spark.readStream.format("chunkcsv")
      .schema(schema).load(dir)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(sink).count() == 3L)
      writeChunk(dir, 3, Seq(4L, 5L))
      q1.processAllAvailable()
      // the new chunk arrived as its own increment, no reprocessing
      assert(spark.read.parquet(sink).select("id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    } finally q1.stop()

    // restart from the checkpoint: only chunks past the watermark replay,
    // so every id lands in the sink exactly once
    writeChunk(dir, 4, Seq(6L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ids = spark.read.parquet(sink).select("id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L, 5L, 6L),
        s"restart lost or replayed chunks: $ids")
    } finally q2.stop()
  }

  test("sf0.01 fixture: kill mid-stream, resume, counts ledger-exact") {
    // The toy tests above prove the watermark logic on hand-written chunks;
    // this one drives it at gate scale: the real documents table (500 rows,
    // ~16 production-writer chunks), one chunk per micro-batch, a HARD stop
    // while a backlog is still pending, more chunks arriving while down,
    // then a resume — the sink must end byte-exact with the fixture
    // (nothing lost to the kill, nothing double-counted on replay).
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val staging = java.nio.file.Files.createTempDirectory("sfstage").toString
    val live = java.nio.file.Files.createTempDirectory("sflive").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sfckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("sfsink").toString
    graft.engine.Sinks.writeChunkedCsv(
      docs.repartition(1).sortWithinPartitions("doc_id"), staging,
      chunkRows = 32)
    val staged = new java.io.File(staging).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".csv"))
      .sortBy(_.getName)
    assert(staged.length >= 8, s"want a real backlog, got ${staged.length}")
    def arrive(files: Array[java.io.File], from: Int): Unit =
      files.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath,
          java.nio.file.Paths.get(live, f"chunk-${from + i}%04d.csv"))
      }
    val (firstHalf, secondHalf) = staged.splitAt(staged.length / 2)
    arrive(firstHalf, 0)

    def start() = spark.readStream.format("chunkcsv").schema(docsSchema)
      .option("maxChunksPerTrigger", "1").load(live)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try {
      // hard stop after the first committed batch, backlog still pending
      val deadline = System.nanoTime() + 60000000000L
      while (q1.recentProgress.length < 1 && System.nanoTime() < deadline)
        Thread.sleep(25)
    } finally q1.stop()

    arrive(secondHalf, firstHalf.length) // chunks land while the query is down

    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(sink).select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      val want = docs.select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == want,
        s"ledger mismatch: got ${got.size} rows, want ${want.size}")
    } finally q2.stop()
  }

  test("streaming filters push into each micro-batch read") {
    val dir = java.nio.file.Files.createTempDirectory("chunkstreamf").toString
    writeChunk(dir, 1, 1L to 10L)
    val q = spark.readStream.format("chunkcsv").schema(schema).load(dir)
      .filter(col("id") > 7L)
      .writeStream.format("memory").queryName("chunkstreamfilter")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("chunkstreamfilter").count() == 3L)
    } finally q.stop()
  }
}
