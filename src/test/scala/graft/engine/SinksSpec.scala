package graft.engine

import java.nio.file.{Files, Path}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark
  private var root: Path = _

  override def beforeAll(): Unit = { root = Files.createTempDirectory("graft-sinks") }
  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("writeChunkedCsv splits at chunkRows per file (reference S2)") {
    import spark.implicits._
    val dir = root.resolve("chunks").toString
    val df = (1 to 250).toDF("n").coalesce(1)
    Sinks.writeChunkedCsv(df, dir, chunkRows = 100)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(files.length == 3) // 100+100+50
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 250)
  }

  test("overwriteParquet is truncate-and-reload (atomic, one job)") {
    import spark.implicits._
    val dir = root.resolve("ow").toString
    Sinks.overwriteParquet(Seq(1, 2, 3).toDF("n"), dir)
    Sinks.overwriteParquet(Seq(9).toDF("n"), dir)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("overwritePartitioned lays out load_date= partitions") {
    import spark.implicits._
    val dir = root.resolve("part").toString
    val df = Seq((1, "2024-01-01"), (2, "2024-01-02"))
      .toDF("n", "load_date")
    Sinks.overwritePartitioned(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("load_date=")).map(_.getName).sorted
    assert(parts.toSeq ==
      Seq("load_date=2024-01-01", "load_date=2024-01-02"))
  }

  test("appendParquet adds rows without truncating") {
    import spark.implicits._
    val dir = root.resolve("app").toString
    Sinks.overwriteParquet(Seq(1).toDF("n"), dir)
    Sinks.appendParquet(Seq(2).toDF("n"), dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("deleteRecursive removes the transient dir (reference S5)") {
    import spark.implicits._
    val dir = root.resolve("tmpout").toString
    val df = Seq(1).toDF("n")
    Sinks.writeChunkedCsv(df, dir)
    assert(new java.io.File(dir).exists())
    assert(Sinks.deleteRecursive(df, dir))
    assert(!new java.io.File(dir).exists())
  }

  test("writeTrainingOrder lands one contiguous position-sorted file per " +
      "shard, physical row order == seq order") {
    import spark.implicits._
    val dir = root.resolve("training-order").toString
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    Pipeline.writeTrainingOrder(docs, "doc_id", dir, nShards = 4)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    var total = 0L
    shardDirs.foreach { sd =>
      val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${sd.getName} must be one contiguous file, got ${parts.length}")
      // single file, single split: collect order IS physical row order
      val rows = spark.read.parquet(parts.head.toString)
        .select("seq", "pos").collect()
      total += rows.length
      assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq,
        s"${sd.getName}: physical order must be exactly seq 1..n")
      val ps = rows.map(_.getString(1)).toSeq
      assert(ps == ps.sorted,
        s"${sd.getName}: rows must be position-sorted on disk")
    }
    assert(total == 200L, "every doc lands in exactly one shard")
  }

  test("writeTrainingOrder curriculum dial: physical order is score-major " +
      "(short sequences first), hash-shuffled within a score level") {
    import spark.implicits._
    val dir = root.resolve("curriculum-order").toString
    // token counts cycle 1..5, so every shard holds several score levels
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill((i % 5).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).cast("long"))
    Pipeline.writeTrainingOrder(docs, "doc_id", dir, nShards = 4,
      curriculumCol = Some("n_tokens"))
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    var total = 0L
    shardDirs.foreach { sd =>
      val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1)
      val rows = spark.read.parquet(parts.head.toString)
        .select("seq", "n_tokens", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      total += rows.length
      assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq,
        s"${sd.getName}: physical order must be exactly seq 1..n")
      val key = rows.map(r => (r._2, r._3))
      assert(key.toSeq == key.sortBy(identity).toSeq,
        s"${sd.getName}: rows must be (score, pos)-sorted on disk")
      assert(rows.map(_._2).distinct.length > 1,
        s"${sd.getName}: fixture must exercise multiple score levels")
    }
    assert(total == 200L)
  }
}
