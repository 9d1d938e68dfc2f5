package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Scale-up ledger harness: replicate the embeddings/documents fixtures F×
  * (distinct ids per replica) and rerun the similarity scale-path queries,
  * reporting wall time AND measured candidate counts — so "LSH/IVF stay
  * sub-quadratic" is a measurement, not an assertion. One JSON line per
  * factor.
  *
  * Replica ids shift by a multiple of 100, so the registry's predicates
  * keep their meaning under replication: `vec_id < 10` still selects the
  * 10 replica-0 centroids (fixed index size), `vec_id % 25 == 0` selects
  * queries in EVERY replica (query set grows with the corpus — the eval
  * workload a growing corpus implies).
  *
  * Usage: runMain graft.ScaleBench [factors]   (default "1,2,4,8")
  * Env: SPARK_GRAFT_SF_DIR (base fixture, default sf0.1), SPARK_GRAFT_CPUS.
  */
object ScaleBench {

  private val Offset = 1000000L // > any fixture id; multiple of 25 and 100

  private def replicate(spark: SparkSession, base: String, table: String,
      idCol: String, factor: Int, outDir: String): Unit = {
    val src = spark.read.parquet(s"$base/$table.parquet")
    val maxId = src.agg(max(col(idCol))).head().getLong(0)
    require(maxId < Offset,
      s"$table.$idCol max $maxId >= replica offset $Offset — replica ids " +
        "would collide and silently corrupt every ledger measurement")
    val all = (0 until factor).map(r =>
      src.withColumn(idCol, col(idCol) + lit(r * Offset)))
      .reduce(_.unionAll(_))
    all.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
  }

  def main(args: Array[String]): Unit = {
    val factors = (if (args.nonEmpty) args.mkString(",") else "1,2,4,8")
      .split(",").map(_.trim.toInt)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Bench.defaultCpus)
    val spark = Bench.withBoundedStore(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("q_sim_neardup_lsh", "q_sim_ivf", "q_sim_recall",
      "q_dedup_clusters", "q_dedup_kept", "q_semdedup", "q_curation")
    // Analytics heavies over the TPC-H side of the fixture: lineitem is
    // replicated on l_orderkey with partkeys UNSHIFTED — order count
    // grows, the part catalog and per-basket width don't, which is the
    // real growth mode; basket-lift's pair-join output (Σ per-order
    // w(w-1)/2) must therefore scale LINEARLY in the factor, never w².
    val analyticsNames = Seq("q_winsorize", "q_winsorize_approx",
      "q_basket_lift")

    def timeOne(name: String, dir: String): Double = {
      Bench.resetState(spark)
      val t0 = System.nanoTime()
      Bench.runToExhaustion(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup on the base fixture, untimed (Bench methodology)
    (names ++ analyticsNames).foreach(n =>
      Bench.runToExhaustion(SparkEntry.queries(n)(spark, base)))

    // Rollup journal read-cost curve (once, base fixture): report cost is
    // O(groups × batches) by design; the measured curve is what motivates
    // a compaction threshold, and the post-compaction point shows the
    // reset to O(groups). One JSON line.
    {
      val ordersDf = spark.read.parquet(s"$base/orders.parquet")
      val jDir = "/tmp/graft-scale/rollup-journal"
      val jPath = new org.apache.hadoop.fs.Path(jDir)
      val fs = jPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(jPath, true)
      def timeReport(): Double = {
        val t0 = System.nanoTime()
        Bench.runToExhaustion(
          graft.engine.Rollup.report(spark, jDir, Seq("o_orderpriority")))
        (System.nanoTime() - t0) / 1e9
      }
      var journaled = 0
      val points = Seq(16, 64, 128).map { target =>
        while (journaled < target) {
          graft.engine.Rollup.journalBatch(
            ordersDf.filter(col("o_orderkey") % 128 === journaled % 128),
            jDir, Seq("o_orderpriority"), "o_totalprice", s"b$journaled")
          journaled += 1
        }
        target -> timeReport()
      }
      val rep = graft.engine.Rollup.compactJournal(spark, jDir)
      require(rep.ok, rep.detail)
      val afterCompact = timeReport()
      val curve = points.map { case (b, s) =>
        "\"b" + b + "\":" +
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))
      }.mkString("{", ",", "}")
      println(s"""{"rollup_report_sec":$curve,"after_compact_sec":""" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(afterCompact)) +
        "}")
      Bench.resetState(spark)
    }

    factors.foreach { f =>
      val dir = s"/tmp/graft-scale/f$f"
      replicate(spark, base, "embeddings", "vec_id", f, dir)
      replicate(spark, base, "documents", "doc_id", f, dir)
      replicate(spark, base, "lineitem", "l_orderkey", f, dir)

      // Basket-lift's self-join output: Σ per-order w(w-1)/2 over distinct
      // (order, part) items — the denominator the lift query's cost is
      // linear in. Measured so "orders grow, width² doesn't" is a number.
      val items = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val basketPairRows = items.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("w"))
        // cast: Spark's `/` is double division; the product is always even
        .select(sum((col("w") * (col("w") - 1) / 2).cast("long")).as("p"))
        .head().getLong(0)

      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val nEmb = emb.count()

      // Measured candidate volumes, via the SAME library code paths the
      // queries use:
      // LSH demo dial (16 planes, 4-bit bands): threshold -1 keeps every
      // banded candidate pair
      val lshCand = Similarity.cosineLshPairs(emb, "vec_id", "embedding",
        dim = 64, threshold = -1.0).count()
      // LSH near-dup dial (64 planes, 16-bit bands): the production
      // setting for a high-threshold dedup sweep — the floor drops
      // ~2^12 per band while exact-dup replicas still share every band
      val lshCandWide = Similarity.cosineLshPairs(emb, "vec_id", "embedding",
        dim = 64, threshold = -1.0, planes = 64).count()
      // IVF: the broadcast-join input is sum over queries of
      // (own-cluster size - 1) — the rows the top-k actually scans
      val assigned = Similarity.assignClusters(emb, "vec_id", "embedding",
        col("vec_id") < 10).localCheckpoint()
      val sizes = assigned.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("c"))
      val ivfCand = assigned.filter(col("vec_id") % 25 === 0)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("q"))
        .join(sizes, "cluster_id")
        .select(sum(col("q") * (col("c") - 1)).as("n"))
        .head().getLong(0)
      val nQueries = assigned.filter(col("vec_id") % 25 === 0).count()

      // SemDeDup's cost driver is Σ per-cell |cell|·(|cell|−1)/2 — the
      // within-cluster pair-join input. Measured under BOTH centroid
      // dials: a FIXED 10 centroids (cells grow ×F → pair work ×F², the
      // degenerate setting) vs a corpus-scaled 10·F centroids (cells stay
      // ~fixture-sized → pair work ~linear). The scaled set must be 10·F
      // DISTINCT vectors (base ids < 10·F), not per-replica copies of the
      // same 10 points — duplicated centroid positions tie-break back to
      // one winner and change nothing. The two curves side by side ARE
      // the documented scaling rule: grow the centroid count with the
      // corpus.
      def semdedupPairs(pred: org.apache.spark.sql.Column): Long =
        Similarity.assignClusters(emb, "vec_id", "embedding", pred)
          .groupBy(col("cluster_id")).agg(count(lit(1)).as("c"))
          .select(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("p"))
          .head().getLong(0)
      val semPairsFixed = semdedupPairs(col("vec_id") < 10)
      val semPairsScaled = semdedupPairs(col("vec_id") < 10L * f)
      Bench.resetState(spark)

      // Dedup endgame: verified pairs → clusters, measuring the ONE dedup
      // stage whose cost is iterative — label-propagation rounds must track
      // component DIAMETER (near-cliques of duplicates: 2-3 rounds flat),
      // never corpus size. Replication multiplies components, not their
      // diameter, so `cc_rounds` staying flat across factors is the claim.
      val docsDf = spark.read.parquet(s"$dir/documents.parquet")
      val verified = Dedup.minhashVerifiedPairs(docsDf, "doc_id", "text", 0.5)
        .select(col("doc_a"), col("doc_b"))
      val (labels, ccRounds) =
        Dedup.connectedComponentsWithRounds(verified, "doc_a", "doc_b")
      val nClusters = labels.select(col("cluster_id")).distinct().count()
      val nClustered = labels.count()
      Bench.resetState(spark)

      // CDC merge cost model: apply a CONSTANT-size change batch (the
      // replica-0 docs under id 500: same rows at every factor) to a
      // snapshot that grows with the corpus. Plain-parquet MERGE rewrites
      // the snapshot, so wall time must track SNAPSHOT size and stay flat
      // in batch size — the measured statement of the documented cost
      // (a table format turns the rewrite into file-level upserts; the
      // join cost itself is the flat part).
      val snapDir = s"$dir/snapshot"
      docsDf.write.mode("overwrite").parquet(snapDir)
      val chg = docsDf.filter(col("doc_id") < 500)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, "D").otherwise("U").as("op"),
          col("doc_id").as("seq"),
          col("text"), col("lang"), col("source"), col("n_chars"))
      val nChg = chg.count()
      val tm0 = System.nanoTime()
      val mergeReport =
        graft.engine.Pipeline.applyChanges(spark, snapDir, chg, "doc_id")
      val mergeSec = (System.nanoTime() - tm0) / 1e9
      require(mergeReport.ok, mergeReport.detail)
      Bench.resetState(spark)

      // Chunked-CSV connector economics: a shipdate-clustered chunk layout
      // (fixed rows/chunk, so chunk count grows with the corpus) under a
      // fixed 3-month predicate. The claim: a selective scan's cost tracks
      // the SURVIVING chunks (a ~constant fraction), and the sidecar
      // answers ungrouped COUNT/MIN/MAX without opening any chunk at any
      // factor — the reference's serial full reread never gets cheaper.
      val chunkDir = s"$dir/lineitem_chunks"
      val liSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("l_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("l_shipdate",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("l_quantity",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("l_extendedprice",
          org.apache.spark.sql.types.DoubleType)))
      graft.engine.Sinks.writeChunkedCsv(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select("l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice")
          .repartitionByRange(8 * f, col("l_shipdate"))
          .sortWithinPartitions("l_shipdate"),
        chunkDir, 100000)
      graft.sources.ChunkStats.index(spark, chunkDir, liSchema,
        Seq("l_shipdate", "l_orderkey"))
      def chunkRead = spark.read.format("chunkcsv").schema(liSchema)
        .load(chunkDir)
      graft.sources.ChunkCsvMetrics.reset()
      val tc0 = System.nanoTime()
      Bench.runToExhaustion(chunkRead
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-06-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-09-01")))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty")))
      val chunkFilteredSec = (System.nanoTime() - tc0) / 1e9
      val chunksPlanned = graft.sources.ChunkCsvMetrics.plannedChunks.sum()
      val chunksOpened = graft.sources.ChunkCsvMetrics.openedChunks.sum()
      val tc1 = System.nanoTime()
      Bench.runToExhaustion(
        chunkRead.agg(sum(col("l_quantity")).as("qty"))) // sum: real scan
      val chunkFullSec = (System.nanoTime() - tc1) / 1e9
      graft.sources.ChunkCsvMetrics.reset()
      val tc2 = System.nanoTime()
      Bench.runToExhaustion(chunkRead
        .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_shipdate"))))
      val chunkMetaSec = (System.nanoTime() - tc2) / 1e9
      val metaOpened = graft.sources.ChunkCsvMetrics.openedChunks.sum()
      Bench.resetState(spark)

      val secs = (names ++ analyticsNames).map(n => n -> timeOne(n, dir))
      // Locale.ROOT: a comma decimal separator would corrupt the JSON.
      val qs = secs.map { case (k, v) =>
        "\"" + k + "\":" +
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      }.mkString("{", ",", "}")
      // brute_pairs: the all-pairs denominator the candidates are a
      // fraction of (queries × corpus for ANN; n² for near-dup)
      println(s"""{"factor":$f,"n_emb":$nEmb,"n_queries":$nQueries,""" +
        s""""lsh_candidates":$lshCand,"lsh16_candidates":$lshCandWide,""" +
        s""""ivf_candidates":$ivfCand,""" +
        s""""brute_query_pairs":${nQueries * (nEmb - 1)},""" +
        s""""allpairs":${nEmb * (nEmb - 1) / 2},""" +
        s""""cc_rounds":$ccRounds,"cc_clusters":$nClusters,""" +
        s""""cc_members":$nClustered,""" +
        s""""semdedup_pairs_fixed":$semPairsFixed,""" +
        s""""semdedup_pairs_scaled":$semPairsScaled,""" +
        s""""basket_pair_rows":$basketPairRows,""" +
        s""""merge_batch_rows":$nChg,"merge_sec":""" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(mergeSec)) +
        s""","chunks_planned":$chunksPlanned,""" +
        s""""chunks_opened":$chunksOpened,""" +
        s""""chunk_meta_opened":$metaOpened,"chunk_filtered_sec":""" +
        String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(chunkFilteredSec)) +
        s""","chunk_full_sec":""" +
        String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(chunkFullSec)) +
        s""","chunk_meta_sec":""" +
        String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(chunkMetaSec)) +
        s""","sec":$qs}""")
    }
    spark.stop()
  }
}
