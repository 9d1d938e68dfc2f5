package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic pins for C4's cross-document span dedup (Raffel et al. 2020
  * §2.2 — all but one occurrence of any duplicated 3-sentence span
  * removed): the oracle gate pins cross-engine parity on the fixture;
  * these pin the METHOD's claims on a handcrafted corpus where the right
  * answer is computable by eye — keep-first keeper selection, partial
  * cross-document overlap, untouched unique docs — plus the span/rewrite
  * reconciliation the two rows must agree on over the real fixture.
  *
  * Handcrafted doc ids are congruent mod 15 (same line width 4+id%5 AND
  * the same (id+i)%3 punctuation phase) and avoid the %5/%7/%11/%101
  * injection ladder, so identical text ⇒ identical synthLines — the only
  * way to plant a duplicated sentence span under the deterministic
  * ladder.
  */
class C4SpanDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Independent Scala reimplementation of the synthLines ladder for ids
    * that dodge every injection arm (the CurationOpsSpec posture).
    */
  private def ladder(docId: Long, text: String): Seq[String] = {
    require(docId % 5 != 0 && docId % 7 != 0 && docId % 11 != 0 &&
      docId % 13 != 0 && docId % 101 != 0,
      "spec ids must dodge the injection ladder")
    val lw = (4 + docId % 5).toInt
    text.split(" ").grouped(lw).zipWithIndex.map { case (g, i) =>
      g.mkString(" ") + (if ((docId + i) % 3 != 0) "." else "")
    }.toSeq
  }

  private val shared = (0 until 25).map(i => s"s$i") // 5 lines at lw=5
  private val d16 = shared.mkString(" ")
  private val d31 = shared.mkString(" ") // identical ⇒ every span duplicated
  private val d46 = (shared.take(15) ++ (0 until 10).map(i => s"u$i"))
    .mkString(" ") // shares ONLY lines 0-2 ⇒ one duplicated span at pos 0
  private val d2 = (0 until 25).map(i => s"z$i").mkString(" ") // unique

  private lazy val tmp: String = {
    import spark.implicits._
    val dir = Scratch.newDir("c4-span-spec")
    Seq((16L, d16), (31L, d31), (46L, d46), (2L, d2)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("keep-first: the lexicographically least occurrence survives; " +
      "every other occurrence coalesces into maximal sentence spans") {
    val spans = Docs.queries("q_dedup_c4_spans")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 16 is the keeper of all three spans (min doc_id) — absent;
    // doc 31's flags at {0,1,2} merge to ONE [0,4] 5-line span; doc 46
    // duplicates only the pos-0 span ⇒ [0,2]; doc 2 is unique — absent
    assert(spans == Set((31L, 0L, 4L, 5L), (46L, 0L, 2L, 3L)),
      s"unexpected spans: $spans")
  }

  test("rewrite drops exactly the covered sentences and reassembles the " +
      "survivors in order; keeper and unique docs keep full pages") {
    val kept = Docs.queries("q_dedup_c4_kept")(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(kept(16L) == ((ladder(16L, d16).mkString(" "), 5L, 0L)))
    assert(kept(31L) == (("", 0L, 5L)))
    assert(kept(46L) == ((ladder(46L, d46).drop(3).mkString(" "), 2L, 3L)))
    assert(kept(2L) == ((ladder(2L, d2).mkString(" "), 5L, 0L)))
  }

  test("fixture reconciliation: span accounting and the rewrite agree " +
      "doc by doc, and kept+dropped partitions every doc's sentences") {
    val dir = "/root/testdata/sf0.001"
    val spans = Docs.queries("q_dedup_c4_spans")(spark, dir).collect()
    assert(spans.nonEmpty, "the ladder's %13 header arm plants dup spans")
    // the %13 boilerplate header is THE cross-document duplicated span by
    // construction: every %13 doc except the keep-first survivor must
    // carry a flagged span anchored at pos 0 covering the 3 header lines
    val h13 = t(spark, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") % 13 === 0).collect().map(_.getLong(0)).toSet
    val headerFlagged = spans
      .filter(r => r.getLong(1) == 0L && r.getLong(2) >= 2L)
      .map(_.getLong(0)).toSet
    assert(h13.size >= 2, "fixture must contain multiple %13 docs")
    assert((h13 -- headerFlagged).size <= 1,
      s"all but the one keeper %13 doc must flag the header span; " +
        s"unflagged: ${(h13 -- headerFlagged).mkString(",")}")
    assert(!headerFlagged.contains(h13.min),
      "the lowest %13 doc_id is the keep-first survivor of the header")
    spans.foreach { r =>
      assert(r.getLong(3) >= 3L, "every maximal span covers >= 3 sentences")
      assert(r.getLong(2) - r.getLong(1) + 1 == r.getLong(3))
    }
    // distinct islands are separated by > l ⇒ coverage intervals are
    // disjoint ⇒ the rewrite's n_dropped is exactly the span-length sum
    val dropByDoc = spans.groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(3)).sum }
    val kept = Docs.queries("q_dedup_c4_kept")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    dropByDoc.foreach { case (d, n) =>
      assert(kept(d)._2 == n,
        s"doc $d: rewrite dropped ${kept(d)._2} sentences but the " +
          s"coalesced spans cover $n")
    }
    kept.collect { case (d, (_, dropped)) if !dropByDoc.contains(d) =>
      assert(dropped == 0L, s"doc $d dropped sentences without a span row")
    }
  }
}
