package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins what makes [[Sketches]] a 100 TB primitive: per-shard sketches
  * merge into an estimate that stays inside the error bound NO MATTER how
  * the scan was sharded, and a given sharding merges deterministically —
  * including through a parquet round-trip. (Union is deliberately NOT
  * pinned as a pure set function: a low-cardinality sketch unions exactly
  * in sparse list mode but the gadget goes dense past a threshold, so two
  * different shardings may legally differ by a within-bounds epsilon —
  * measured here: 491 vs 499 on 500 true uniques. The contract that holds
  * at every scale is the error bound, and that is what jobs rely on.)
  */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def docs = graft.engine.Sources.table(spark,
    "/root/testdata/sf0.001", "documents")

  test("every shard dimension merges to within 3% of exact, repeatably") {
    val exact = docs.select(col("doc_id")).distinct().count()
    for (shard <- Seq(Seq("source"), Seq("lang"), Seq("lang", "source"))) {
      val est = Sketches.mergeEstimate(
        Sketches.sketchBy(docs, "doc_id", shard), Nil).head().getLong(0)
      assert(math.abs(est - exact).toDouble / exact <= 0.03,
        s"merge of $shard shards: $est vs exact $exact exceeds 3%")
      val again = Sketches.mergeEstimate(
        Sketches.sketchBy(docs, "doc_id", shard), Nil).head().getLong(0)
      assert(est == again, s"merge of $shard shards not deterministic")
    }
  }

  test("fine sketches roll up to coarse groups without rescanning") {
    val fine = Sketches.sketchBy(docs, "doc_id", Seq("lang", "source"))
      .localCheckpoint() // stands in for the persisted parquet state
    val rolled = Sketches.mergeEstimate(fine, Seq("lang"))
    val direct = Sketches.mergeEstimate(
      Sketches.sketchBy(docs, "doc_id", Seq("lang")), Seq("lang"))
    val l = rolled.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(l == r, s"rollup $l != direct $r")
  }

  test("sketch survives a parquet round-trip as a binary column") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    Sketches.sketchBy(docs, "doc_id", Seq("source"))
      .write.mode("overwrite").parquet(dir)
    val reread = Sketches.mergeEstimate(spark.read.parquet(dir), Nil)
      .head().getLong(0)
    val inMem = Sketches.mergeEstimate(
      Sketches.sketchBy(docs, "doc_id", Seq("source")), Nil)
      .head().getLong(0)
    assert(reread == inMem,
      s"persisted-sketch estimate $reread != in-memory $inMem")
  }
}
