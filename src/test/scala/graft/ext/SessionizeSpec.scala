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
}
