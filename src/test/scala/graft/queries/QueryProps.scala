package graft.queries

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.ext.Dedup

/** ScalaCheck laws for the split / decontamination invariants — these run
  * REAL Spark plans per trial, so the trial count is capped well below the
  * library default.
  */
object QueryProps extends Properties("Queries") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  /** Pure-JVM mirror of [[splitCol]]'s documented hash rule: md5 of
    * "split:<id>", first 4 hex digits as a number, mod 100, 90/5/5. The
    * property pins the Spark expression to THIS formula — which is also
    * what the DuckDB splitsCte encodes — so a drive-by "optimization" of
    * either side fails here instead of in the oracle diff.
    */
  private def expectedSplit(id: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bucket = java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100
    if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
  }

  private val idList: Gen[List[Long]] = for {
    n <- Gen.chooseNum(2, 20)
    ids <- Gen.listOfN(n, Gen.chooseNum(0L, 1000000L))
  } yield ids.distinct

  private def assign(ids: Seq[Long], partitions: Int): Map[Long, String] = {
    import spark.implicits._
    ids.toDF("doc_id").repartition(partitions)
      .select(col("doc_id"), splitCol(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  property("splitCol is a pure function of the id: permutation- and " +
      "partitioning-independent, matching the documented hash rule") =
    Prop.forAllNoShrink(idList, Gen.chooseNum(1, 8),
        Gen.long) { (ids, parts, seed) =>
      val direct = assign(ids, 1)
      val permuted = assign(new scala.util.Random(seed).shuffle(ids), parts)
      direct == permuted && ids.forall(id => direct(id) == expectedSplit(id))
    }

  /** Random corpora of duplicate groups: each group shares one text (from a
    * group-unique vocabulary, so cross-group LSH collisions are not
    * reachable), ids are distinct across the corpus.
    */
  private val corpus: Gen[List[(Long, String)]] = for {
    nGroups <- Gen.chooseNum(2, 4)
    sizes <- Gen.listOfN(nGroups, Gen.chooseNum(1, 4))
    ids <- Gen.listOfN(sizes.sum * 3, Gen.chooseNum(0L, 1000000L))
      .map(_.distinct).suchThat(_.length >= sizes.sum)
  } yield {
    val texts = sizes.indices.map(g =>
      (0 until 12).map(i => s"group${g}token$i").mkString(" "))
    sizes.zipWithIndex.flatMap { case (sz, g) =>
      val lo = sizes.take(g).sum
      ids.slice(lo, lo + sz).map(_ -> texts(g))
    }.toList
  }

  property("decontamination flags every cross-split exact-dup pair and " +
      "never a same-split pair") = Prop.forAllNoShrink(corpus) { docs =>
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    // the q_decontamination composition, verbatim
    val flagged = Dedup.minhashPairs(df, "doc_id", "text")
      .withColumn("split_a", splitCol(col("doc_a")))
      .withColumn("split_b", splitCol(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val noSameSplit = flagged.forall { case (a, b) =>
      expectedSplit(a) != expectedSplit(b)
    }
    // identical texts always share every band, so any cross-split pair
    // within a duplicate group MUST surface
    val mustFlag = for {
      (a, ta) <- docs; (b, tb) <- docs
      if a < b && ta == tb && expectedSplit(a) != expectedSplit(b)
    } yield (a, b)
    noSameSplit && mustFlag.forall(flagged.contains)
  }

  /** Small random embedding corpora: a handful of base directions plus
    * near-duplicates of some of them, ids distinct, order randomized —
    * enough structure for non-trivial clusters and drops.
    */
  private val vecCorpus: Gen[List[(Long, Seq[Float])]] = for {
    n <- Gen.chooseNum(4, 16)
    dirs <- Gen.listOfN(n, Gen.chooseNum(0, 3))
    noise <- Gen.listOfN(n, Gen.chooseNum(-5, 5))
  } yield dirs.zip(noise).zipWithIndex.map { case ((d, nz), i) =>
    val v = Array.fill(4)(0f)
    v(d) = 1f
    v((d + 1) % 4) = nz * 0.01f // near-dup jitter within the direction
    (i.toLong, v.toSeq)
  }

  property("semanticDedupReport: counts partition each cell, the lowest " +
      "member survives, row order never matters") =
    Prop.forAllNoShrink(vecCorpus) { rows =>
      import spark.implicits._
      def report(rs: Seq[(Long, Seq[Float])]) =
        graft.ext.Similarity.semanticDedupReport(
            rs.toDF("vec_id", "embedding"), "vec_id", "embedding",
            col("vec_id") < 2, threshold = 0.9)
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
      val rep = report(rows)
      val partitions = rep.values.forall { case (m, d, k) => m == d + k }
      val allCounted = rep.values.map(_._1).sum == rows.length
      // the lowest id in a cluster is never a pair's vec_b, so every
      // non-empty cell keeps at least one member
      val survivorPerCell = rep.values.forall { case (_, _, k) => k >= 1 }
      val orderFree = report(rows.reverse) == rep
      partitions && allCounted && survivorPerCell && orderFree
    }
}
