package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private def frames = {
    import spark.implicits._
    val probes = Seq((1L, 101L, ts(10)), (1L, 102L, ts(30)), (2L, 201L, ts(5)))
      .toDF("user_id", "event_id", "ts")
    val refs = Seq((1L, ts(8)), (1L, ts(10)), (1L, ts(25)), (3L, ts(1)))
      .toDF("user_id", "ts")
    (probes, refs)
  }

  test("latest preceding-or-equal reference per probe, running count") {
    val (probes, refs) = frames
    val out = AsOf.enrich(probes, refs, "user_id", "ts", "ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1),
        Option(r.getAs[Timestamp]("asof_ts")), r.getLong(r.length - 1)))
    // probe@10: refs at 08 and 10 precede-or-equal -> asof 10, count 2
    assert(out(0) == ((101L, Some(ts(10)), 2L)))
    // probe@30: ref 25 latest, 3 total
    assert(out(1) == ((102L, Some(ts(25)), 3L)))
    // user 2 has no refs: null, 0
    assert(out(2) == ((201L, None, 0L)))
  }

  test("enrichForward: earliest following-or-equal reference, running count") {
    val (probes, refs) = frames
    val out = AsOf.enrichForward(probes, refs, "user_id", "ts", "ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1),
        Option(r.getAs[Timestamp]("asof_ts")), r.getLong(r.length - 1)))
    // probe@10: refs at 10 (equal counts) and 25 follow -> next 10, count 2
    assert(out(0) == ((101L, Some(ts(10)), 2L)))
    // probe@30: nothing follows -> null, 0
    assert(out(1) == ((102L, None, 0L)))
    // user 2 has no refs at all
    assert(out(2) == ((201L, None, 0L)))
  }

  test("enrichForward: NULL probe timestamp matches nothing (nulls-first parity)") {
    import spark.implicits._
    val probes = Seq((1L, 301L, Option.empty[Timestamp]),
        (1L, 302L, Some(ts(5))))
      .toDF("user_id", "event_id", "ts")
    val refs = Seq((1L, ts(8))).toDF("user_id", "ts")
    val out = AsOf.enrichForward(probes, refs, "user_id", "ts", "ts")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1),
        Option(r.getAs[Timestamp]("asof_ts")), r.getLong(r.length - 1)))
    // null-ts probe: no match, zero count (plain .desc would hand it ts(8))
    assert(out(0) == ((301L, None, 0L)))
    assert(out(1) == ((302L, Some(ts(8)), 1L)))
  }

  test("enrichWithin nulls out matches older than the tolerance") {
    import org.apache.spark.sql.functions.expr
    val (probes, refs) = frames
    val out = AsOf.enrichWithin(probes, refs, "user_id", "ts", "ts",
        expr("INTERVAL 10 MINUTES"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(1), Option(r.getAs[Timestamp]("asof_ts"))))
    // probe@10: latest ref at 10:10, age 0 -> kept
    assert(out(0) == ((101L, Some(ts(10)))))
    // probe@30: latest ref at 10:25, age 5 min < 10 -> kept
    assert(out(1) == ((102L, Some(ts(25)))))
    // no refs for user 2 -> still null
    assert(out(2) == ((201L, None)))
    // EXACT boundary: probe@30 vs ref@25 with tolerance 5 min (age == tol)
    // must be KEPT — inclusive >=, matching the oracle's `>= ts - INTERVAL`
    val boundary = AsOf.enrichWithin(probes, refs, "user_id", "ts", "ts",
        expr("INTERVAL 5 MINUTES"))
      .orderBy("event_id")
      .collect().map(r => Option(r.getAs[Timestamp]("asof_ts")))
    assert(boundary.toSeq == Seq(Some(ts(10)), Some(ts(25)), None))
    // below the boundary: 1-minute tolerance drops probe@30's 5-min-old ref
    // (probe@10's exact-instant ref survives any tolerance)
    val strict = AsOf.enrichWithin(probes, refs, "user_id", "ts", "ts",
        expr("INTERVAL 1 MINUTE"))
      .orderBy("event_id")
      .collect().map(r => Option(r.getAs[Timestamp]("asof_ts")))
    assert(strict.toSeq == Seq(Some(ts(10)), None, None))
  }

  test("NULL keys and NULL reference timestamps never match (equi semantics)") {
    import spark.implicits._
    val probes = Seq(
      (Some(1L), 101L, Some(ts(10))),
      (None, 102L, Some(ts(10)))) // null-key probe
      .toDF("user_id", "event_id", "ts")
    val refs = Seq(
      (Some(1L), Some(ts(8))),
      (None, Some(ts(9))),     // null-key ref: matches nothing
      (Some(1L), None))        // null-ts ref: must not inflate the count
      .toDF("user_id", "ts")
    val out = AsOf.enrich(probes, refs, "user_id", "ts", "ts")
      .orderBy("event_id").collect()
    assert(Option(out(0).getAs[Timestamp]("asof_ts")) == Some(ts(8)))
    assert(out(0).getLong(out(0).length - 1) == 1L) // null-ts ref not counted
    assert(out(1).getAs[Timestamp]("asof_ts") == null) // null-key probe
    assert(out(1).getLong(out(1).length - 1) == 0L)
  }

  test("empty reference side yields nulls, keeps all probes") {
    import spark.implicits._
    val (probes, _) = frames
    val empty = Seq.empty[(Long, Timestamp)].toDF("user_id", "ts")
    val out = AsOf.enrich(probes, empty, "user_id", "ts", "ts")
    assert(out.count() == 3)
    assert(out.filter(org.apache.spark.sql.functions.col("asof_ts").isNotNull)
      .count() == 0)
  }
}
