package graft.ext

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("gap splits sessions; session ids are 1-based per key in time order") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, ts(0), 1.0), (1L, 2L, ts(5), 2.0),   // session 1
      (1L, 3L, ts(50), 4.0),                          // 45-min gap -> session 2
      (2L, 4L, ts(1), 8.0))                           // other user
      .toDF("user_id", "event_id", "ts", "value")
    val out = Sessionize.sessions(events, "user_id", "ts", "event_id",
        gapMillis = 30 * 60 * 1000L, valueCol = "value")
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 8.0)))
  }

  test("boundary: a gap of exactly gapMillis stays in the same session") {
    import spark.implicits._
    val events = Seq((1L, 1L, ts(0), 1.0), (1L, 2L, ts(30), 1.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Sessionize.sessions(events, "user_id", "ts", "event_id",
      gapMillis = 30 * 60 * 1000L, valueCol = "value")
    assert(out.count() == 1) // strict > splits, == keeps
  }

  test("built-in session_window merges at exactly last_ts + gap too") {
    // Pins the boundary semantics q_session_window's oracle encodes
    // (`> 1800000` splits): session_window's merge condition is
    // sessionStart <= currentSessionEnd, so an event at exactly
    // last_ts + gap joins the session — same inclusive boundary as the
    // custom path above. The fixture has no exact-boundary gaps, so only
    // this test can catch a divergence.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq((1L, ts(0), 1.0), (1L, ts(30), 2.0),
      (1L, Timestamp.valueOf("2024-01-01 11:01:00"), 4.0))
      .toDF("user_id", "ts", "value")
    val out = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("n"), col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    // 10:00 and 10:30 merge (exact boundary); 10:61 (31 min later) splits
    assert(out == Set((2L, 3.0), (1L, 4.0)))
  }
}
