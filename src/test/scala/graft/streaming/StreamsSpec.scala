package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.Streams.Event

/** MemoryStream-driven verification of the streaming surface (no DuckDB
  * oracle exists for streams — SURVEY §7.4).
  */
class StreamsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def runBatches[T](q: StreamingQuery)(steps: (() => T)*): Unit =
    try steps.foreach { step => step(); q.processAllAvailable() }
    finally q.stop() // a thrown batch must not leak the query into the shared session

  test("tumblingAgg counts per 10-minute window, drops late rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.tumblingAgg(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    runBatches(q)(
      () => in.addData(
        Event(1, 1, "click", 1.0, ts(1)),
        Event(2, 1, "click", 2.0, ts(4)),
        Event(3, 2, "view", 5.0, ts(12))),
      // watermark is now 12:00-5min = 07:00 -> a 10:00:00 row in the first
      // window is late-but-within... then one BEYOND the watermark:
      () => in.addData(Event(4, 3, "click", 8.0, ts(25))),
      // watermark 20:00; this row (window 00-10) is older -> dropped
      () => in.addData(Event(5, 9, "click", 100.0, ts(2))))
    val out = spark.table("tumbling")
      .selectExpr("cast(bucket as string)", "event_type", "n", "total")
      .collect().map(_.toSeq).toSet
    assert(out.contains(Seq("2024-01-01 10:00:00", "click", 2L, 3.0)))
    assert(out.contains(Seq("2024-01-01 10:10:00", "view", 1L, 5.0)))
    assert(out.contains(Seq("2024-01-01 10:20:00", "click", 1L, 8.0)))
    // the late event must NOT have bumped window 10:00 to n=3
    assert(!out.exists(r => r.head == "2024-01-01 10:00:00" && r(2) == 3L))
  }

  test("slidingAgg lands each event in two overlapping windows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.slidingAgg(in.toDF(), "10 minutes", "5 minutes",
        "1 minute")
      .writeStream.format("memory").queryName("sliding")
      .outputMode("update").start()
    runBatches(q)(() => in.addData(Event(1, 1, "click", 1.0, ts(7))))
    val starts = spark.table("sliding")
      .selectExpr("cast(window_start as string)").collect().map(_.getString(0))
    assert(starts.toSet ==
      Set("2024-01-01 10:00:00", "2024-01-01 10:05:00"))
  }

  test("sessionize emits a session after the gap, via event-time timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDS(), gapMillis = 10 * 60 * 1000L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    runBatches(q)(
      // one burst for user 1: minutes 1,3,5
      () => in.addData(
        Event(1, 1, "click", 1.0, ts(1)),
        Event(2, 1, "click", 2.0, ts(3)),
        Event(3, 1, "view", 3.0, ts(5))),
      // much later event advances the watermark past 05+gap -> timeout
      () => in.addData(Event(9, 2, "click", 0.5, ts(40))),
      // and one more batch so the timer actually fires
      () => in.addData(Event(10, 2, "click", 0.5, ts(45))))
    val rows = spark.table("sessions")
      .selectExpr("user_id", "cast(session_start as string)",
        "cast(session_end as string)", "n_events", "total_value")
      .collect().map(_.toSeq)
    assert(rows.contains(Seq(1L, "2024-01-01 10:01:00",
      "2024-01-01 10:05:00", 3L, 6.0)))
  }

  test("sessionize splits on in-batch gaps without waiting for timeout") {
    val state = new FakeGroupState[Streams.SessionState](None)
    val sessions = Streams.updateSessions(gapMillis = 10 * 60 * 1000L)(
      7L,
      Iterator(
        Event(1, 7, "a", 1.0, ts(0)),
        Event(2, 7, "a", 1.0, ts(2)),
        Event(3, 7, "a", 4.0, ts(30)), // 28-min gap -> closes first session
        Event(4, 7, "a", 1.0, ts(35))),
      state).toSeq
    assert(sessions ==
      Seq(Streams.Session(7L, ts(0), ts(2), 2L, 2.0)))
    // the trailing OPEN session must survive in state for the timeout path
    assert(state.get == Streams.SessionState(ts(30), ts(35), 2L, 5.0))
  }

  test("dedupStream drops same-key duplicates across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.dedupStream(in.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    runBatches(q)(
      () => in.addData(Event(1, 1, "click", 1.0, ts(1)),
        Event(1, 1, "click", 1.0, ts(1)), // in-batch dup
        Event(2, 1, "view", 2.0, ts(2))),
      () => in.addData(Event(1, 1, "click", 1.0, ts(3)), // cross-batch dup
        Event(3, 2, "click", 5.0, ts(4))))
    val ids = spark.table("dedupstream").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("readEventsStream: file-based streaming source end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    Seq(Event(1, 1, "click", 1.0, ts(1)), Event(2, 1, "view", 2.0, ts(3)))
      .toDF().write.mode("overwrite").parquet(dir.toString)
    val q = Streams.tumblingAgg(
        Streams.readEventsStream(spark, dir.toString), "10 minutes")
      .writeStream.format("memory").queryName("filestream")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("filestream").collect()
    assert(out.map(_.getAs[Long]("n")).sum == 2L)
  }

  test("cross-batch straggler within the gap extends session start back") {
    val state = new FakeGroupState(
      Some(Streams.SessionState(ts(10), ts(12), 2L, 3.0)))
    val out = Streams.updateSessions(gapMillis = 10 * 60 * 1000L)(
      7L, Iterator(Event(9, 7, "a", 1.0, ts(4))), state).toSeq
    assert(out.isEmpty)
    assert(state.get == Streams.SessionState(ts(4), ts(12), 3L, 4.0))
  }

  test("consecutive stragglers within the gap merge into ONE closed session") {
    val state = new FakeGroupState(
      Some(Streams.SessionState(ts(50), ts(52), 1L, 1.0)))
    val out = Streams.updateSessions(gapMillis = 10 * 60 * 1000L)(
      7L, Iterator(
        Event(1, 7, "a", 1.0, ts(0)),
        Event(2, 7, "a", 2.0, ts(8))), // 8 min apart -> same session
      state).toSeq
    assert(out == Seq(Streams.Session(7L, ts(0), ts(8), 2L, 3.0)))
    assert(state.get.start == ts(50)) // open session untouched
  }

  test("straggler older than the open session by > gap closes as singleton") {
    val state = new FakeGroupState(
      Some(Streams.SessionState(ts(40), ts(42), 1L, 1.0)))
    val out = Streams.updateSessions(gapMillis = 10 * 60 * 1000L)(
      7L, Iterator(Event(9, 7, "a", 2.0, ts(5))), state).toSeq
    assert(out == Seq(Streams.Session(7L, ts(5), ts(5), 1L, 2.0)))
    assert(state.get.start == ts(40)) // open session untouched
  }

  test("textScrub on a stream equals the batch projection row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox mails a.user@example.com daily"),
      (2L, "der hund und die katze ist da call 555-0142 now"),
      (3L, "x x x x x"))
    val in = MemoryStream[(Long, String)]
    val q = Streams.textScrub(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scrubstream")
      .outputMode("append").start()
    runBatches(q)(
      () => in.addData(docs.take(2): _*),
      () => in.addData(docs.drop(2): _*))
    val streamed = spark.table("scrubstream")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    val batch = Streams.textScrub(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(streamed == batch)
    // the scrub actually fired
    val clean = streamed.map(_.last.asInstanceOf[String])
    assert(clean(0).contains("<EMAIL>") && clean(1).contains("<PHONE>"))
  }

  test("batch mode runs the same plans (Kappa pattern)") {
    import spark.implicits._
    val batch = Seq(
      Event(1, 1, "click", 1.0, ts(1)),
      Event(2, 1, "click", 2.0, ts(14))).toDF()
    val out = Streams.tumblingAgg(batch, "10 minutes").collect()
    assert(out.length == 2)
  }

  test("enrichWithStatic joins the dim without state; unmatched keys keep null") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = Streams.enrichWithStatic(in.toDF(), dim, Seq("user_id"))
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    runBatches(q)(
      () => in.addData(
        Event(1, 1, "click", 1.0, ts(1)),
        Event(2, 9, "click", 2.0, ts(2))))
    val out = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("gold"), 2L -> None))
  }

  test("joinEventStreams: time-bounded stream-stream join matches in-window pairs only") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = Streams.joinEventStreams(views.toDF(), clicks.toDF(),
        watermarkDelay = "5 minutes", within = "15 minutes")
      .writeStream.format("memory").queryName("joined")
      .outputMode("append").start()
    runBatches(q)(
      () => {
        views.addData(Event(10, 1, "view", 0, ts(0)),
          Event(11, 2, "view", 0, ts(0)))
        clicks.addData(
          Event(20, 1, "click", 0, ts(10)), // user 1, within 15 min -> match
          Event(21, 2, "click", 0, ts(40)), // user 2, 40 min later -> out
          Event(22, 3, "click", 0, ts(5))) // user 3: no view at all
      })
    val out = spark.table("joined")
      .select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 20L)))
  }

  test("startIncrementalLoad: stream-ingested table == batch-ingested table") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-incr")
    try {
      val streamed = s"$root/streamed"
      val batched = s"$root/batched"
      val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
      val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
      val b1 = Seq((1L, "v1"), (2L, "v1"))
      val b2 = Seq((2L, "v2"), (3L, "v1"))

      val in = MemoryStream[(Long, String)]
      val q = Streams.startIncrementalLoad(
        in.toDF().toDF("id", "payload"), streamed, s"$root/ckpt",
        at = id => Some(if (id == 0) t1 else t2))
      runBatches(q)(() => in.addData(b1: _*), () => in.addData(b2: _*))

      for ((b, t) <- Seq(b1 -> t1, b2 -> t2)) {
        b.toDF("id", "payload").write.mode("overwrite").parquet(s"$root/stg")
        graft.engine.Pipeline.loadIncremental(spark, s"$root/stg", batched,
          Some(t))
      }

      def snap(dir: String) =
        graft.engine.Pipeline.readLatest(spark, dir, Seq("id"))
          .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(snap(streamed).toSeq == snap(batched).toSeq)
      assert(snap(streamed).map(_.head).toSeq == Seq(1L, 2L, 3L))
      // the streaming path journals the sidecar like the batch one
      assert(graft.engine.Pipeline.sidecarSchema(spark, streamed).isDefined)

      // foreachBatch is at-least-once: replaying a committed batchId must
      // be a no-op (commit-ledger guard), not a duplicate append
      val before = spark.read.parquet(streamed).count()
      Streams.appendBatchIdempotent(b2.toDF("id", "payload"), streamed,
        batchId = 1L, at = Some(t2))
      assert(spark.read.parquet(streamed).count() == before,
        "replayed batch must not duplicate rows")
      // a genuinely new batch still lands
      Streams.appendBatchIdempotent(Seq((9L, "v9")).toDF("id", "payload"),
        streamed, batchId = 2L, at = Some(t2))
      assert(spark.read.parquet(streamed).count() == before + 1)
      // the row-count ledger matches the table after clean commits...
      assert(Streams.ledgerConsistent(spark, streamed))
      // ...and flags the crash-between-append-and-marker seam: rows landed
      // with no marker accounting for them
      graft.engine.Pipeline.appendCleaned(
        Seq((10L, "vX")).toDF("id", "payload"), streamed, Some(t2))
      assert(!Streams.ledgerConsistent(spark, streamed),
        "unledgered append must be detected")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("startCdcMerge: streamed changes == one-shot batch merge; replay converges") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdc")
    try {
      val snapDir = s"$root/snap"
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "name", "amount").write.parquet(snapDir)

      // batch 1: update id=2, delete id=3; batch 2: insert id=4, then a
      // same-key later update wins within the batch (seq last-wins)
      val b1 = Seq((2L, "U", 1L, "b2", 21.0), (3L, "D", 2L, null, 0.0))
      val b2 = Seq((4L, "I", 3L, "d", 40.0), (4L, "U", 4L, "d2", 41.0))
      val cols = Seq("id", "op", "seq", "name", "amount")

      val in = MemoryStream[(Long, String, Long, String, Double)]
      val q = Streams.startCdcMerge(in.toDF().toDF(cols: _*), snapDir,
        s"$root/ckpt", keyCol = "id")
      runBatches(q)(() => in.addData(b1: _*), () => in.addData(b2: _*))

      def snap() = spark.read.parquet(snapDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val streamed = snap()
      assert(streamed == Seq((1L, "a", 10.0), (2L, "b2", 21.0),
        (4L, "d2", 41.0)))

      // MERGE is idempotent: re-applying the last batch (foreachBatch
      // at-least-once replay) must not change the snapshot — the property
      // that lets the CDC path run WITHOUT the append ledger
      graft.engine.Pipeline.applyChanges(spark, snapDir,
        b2.toDF(cols: _*), "id")
      assert(snap() == streamed, "replayed merge batch must converge")

      // a partial change image (payload column missing) nulls the column
      // rather than silently keeping the stale value (full-row semantics)
      graft.engine.Pipeline.applyChanges(spark, snapDir,
        Seq((1L, "U", 9L, 11.0)).toDF("id", "op", "seq", "amount"), "id")
      val r1 = spark.read.parquet(snapDir).filter($"id" === 1L)
        .select("name", "amount").head()
      assert(r1.isNullAt(0) && r1.getDouble(1) == 11.0)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("rollup journal: streamed partials == direct aggregate, replay-safe") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-rollup-stream")
    try {
      val journal = s"$root/journal"
      val b1 = Seq(("A", 10.0), ("B", 20.0), ("A", 5.0))
      val b2 = Seq(("A", 1.0), ("C", 7.0))
      val in = MemoryStream[(String, Double)]
      val q = Streams.startRollupJournal(in.toDF().toDF("k", "v"), journal,
        s"$root/ckpt", Seq("k"), "v")
      runBatches(q)(() => in.addData(b1: _*), () => in.addData(b2: _*))

      def report() = graft.engine.Rollup.report(spark, journal, Seq("k"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val direct = (b1 ++ b2).toDF("k", "v").groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("total"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(report() == direct)

      // at-least-once replay of a committed batchId journals nothing new
      val rows = spark.read.parquet(journal).count()
      Streams.journalBatchIdempotent(b2.toDF("k", "v"), journal, 1L,
        Seq("k"), "v")
      assert(spark.read.parquet(journal).count() == rows,
        "replayed batch must not double-count partials")
      assert(report() == direct)

      // a genuinely new batch still lands and shifts the report
      Streams.journalBatchIdempotent(Seq(("C", 3.0)).toDF("k", "v"),
        journal, 2L, Seq("k"), "v")
      assert(report().find(_._1 == "C").get._2 == 10.0)

      // ledger audit: ledgered batches are consistent; compaction keeps
      // markers alive (replay no-ops) without flagging; an UNLEDGERED
      // direct append is detected
      assert(Streams.rollupLedgerConsistent(spark, journal))
      val rep = graft.engine.Rollup.compactJournal(spark, journal)
      assert(rep.ok, rep.detail)
      assert(Streams.rollupLedgerConsistent(spark, journal),
        "markers surviving compaction must not flag as orphans")
      graft.engine.Rollup.journalBatch(Seq(("D", 1.0)).toDF("k", "v"),
        journal, Seq("k"), "v", "b99")
      assert(!Streams.rollupLedgerConsistent(spark, journal),
        "unledgered journal append must be detected")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("drift monitor: stream-computed PSI from the journal alone == " +
      "q_psi_journal's batch answer, through an at-least-once replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-drift")
    try {
      val dir = "/root/testdata/sf0.001"
      val journal = s"$root/journal"
      val verdicts = s"$root/verdicts"
      val grid = (1 to 9).map(_ * 50000.0).toArray // q_psi_journal's grid
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val b1 = orders.filter(_._1 % 2 == 0).map(r => (r._2, r._3)).toSeq
      val b2 = orders.filter(_._1 % 2 == 1).map(r => (r._2, r._3)).toSeq
      val in = MemoryStream[(String, Double)]
      val q = Streams.startDriftMonitor(
        in.toDF().toDF("o_orderstatus", "o_totalprice"), journal, verdicts,
        s"$root/ckpt", "o_orderstatus", "o_totalprice", grid)
      runBatches(q)(() => in.addData(b1: _*), () => in.addData(b2: _*))
      def verdict() = spark.read.parquet(s"$verdicts/b1").collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getBoolean(5))).toMap
      val streamed = verdict()
      val batchAnswer = graft.SparkEntry.queries("q_psi_journal")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(streamed.keySet == batchAnswer.keySet)
      streamed.foreach { case (k, (psi, bins, nr, nc, drifted)) =>
        assert((psi, bins, nr, nc) == batchAnswer(k),
          s"stream verdict for $k diverges from the batch answer")
        assert(drifted == (psi > 0.2))
      }
      // at-least-once replay: re-running the committed batch changes
      // neither the journal nor the verdict
      val journalRows = spark.read.parquet(journal).count()
      Streams.driftBatchIdempotent(
        b2.toDF("o_orderstatus", "o_totalprice"), journal, verdicts, 1L,
        "o_orderstatus", "o_totalprice", grid, 0L, 0.2)
      assert(spark.read.parquet(journal).count() == journalRows,
        "replayed batch must not double-journal its histogram")
      assert(verdict() == streamed,
        "replayed batch must recompute an identical verdict")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("composition: one CDC stream drives snapshot + rollup; report == snapshot agg through replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-compose")
    try {
      // The production topology end-to-end: ONE change stream fans out to
      // TWO standing consumers — startCdcMerge maintains current state,
      // startRollupJournal maintains the report — and the standing report
      // must equal a direct aggregate over the merged snapshot, including
      // after at-least-once replay at BOTH consumers. Append-only changes:
      // rollup partials are insert-monotone (an update/delete would need a
      // retraction partial; the snapshot alone handles those).
      val snapDir = s"$root/snap"
      val journal = s"$root/journal"
      Seq.empty[(Long, String, Double)].toDF("id", "k", "v")
        .write.parquet(snapDir)
      val cols = Seq("id", "op", "seq", "k", "v")
      val b1 = Seq((1L, "I", 1L, "A", 10.0), (2L, "I", 1L, "B", 20.0))
      val b2 = Seq((3L, "I", 1L, "A", 5.0), (4L, "I", 1L, "C", 7.0))

      val in = MemoryStream[(Long, String, Long, String, Double)]
      val changes = in.toDF().toDF(cols: _*)
      val qMerge = Streams.startCdcMerge(changes, snapDir,
        s"$root/ckpt-merge", keyCol = "id")
      val qRoll = Streams.startRollupJournal(changes.select("k", "v"),
        journal, s"$root/ckpt-roll", Seq("k"), "v")
      try {
        in.addData(b1: _*)
        qMerge.processAllAvailable(); qRoll.processAllAvailable()
        in.addData(b2: _*)
        qMerge.processAllAvailable(); qRoll.processAllAvailable()
      } finally { qMerge.stop(); qRoll.stop() }

      def reportRows() = graft.engine.Rollup.report(spark, journal, Seq("k"))
        .select("k", "total", "n")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      def snapAgg() = spark.read.parquet(snapDir).groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("total"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._1).toSeq

      val expected = Seq(("A", 15.0, 2L), ("B", 20.0, 1L), ("C", 7.0, 1L))
      assert(snapAgg() == expected)
      assert(reportRows() == expected,
        "standing report diverged from the merged snapshot")

      // at-least-once replay of the last batch at BOTH consumers: merge
      // converges by idempotence, journal by the commit ledger — the
      // composed invariant survives
      graft.engine.Pipeline.applyChanges(spark, snapDir,
        b2.toDF(cols: _*), "id")
      Streams.journalBatchIdempotent(
        b2.toDF(cols: _*).select("k", "v"), journal, 1L, Seq("k"), "v")
      assert(snapAgg() == expected && reportRows() == expected,
        "replay at either consumer broke the composed invariant")

      // journal compaction is invisible to the composition
      val rep = graft.engine.Rollup.compactJournal(spark, journal)
      assert(rep.ok, rep.detail)
      assert(reportRows() == expected)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("backfillDay repairs one partition; ledger audit stays exact") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-backfill")
    try {
      val dir = s"$root/tbl"
      val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
      val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
      Streams.appendBatchIdempotent(
        Seq((1L, "bad"), (2L, "bad"), (3L, "bad")).toDF("id", "payload"),
        dir, batchId = 0L, at = Some(t1))
      Streams.appendBatchIdempotent(
        Seq((4L, "ok")).toDF("id", "payload"), dir, batchId = 1L,
        at = Some(t2))
      assert(Streams.ledgerConsistent(spark, dir))

      // day-1 repair: replace 3 bad rows with 2 corrected ones
      val written = graft.engine.Pipeline.backfillDay(
        Seq((1L, "fixed"), (2L, "fixed")).toDF("id", "payload"), dir, t1)
      assert(written == 2L)
      val byDay = spark.read.parquet(dir)
        .groupBy("load_date").count().collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      assert(byDay("2024-01-01") == 2L, "day 1 not replaced")
      assert(byDay("2024-01-02") == 1L, "day 2 must be untouched")
      assert(spark.read.parquet(dir).filter($"payload" === "bad").count() == 0)
      assert(Streams.ledgerConsistent(spark, dir),
        "backfill delta marker must keep the ledger audit exact")

      // a SECOND repair of the same day must accumulate the delta, not
      // overwrite it — the audit stays exact through repeated backfills
      graft.engine.Pipeline.backfillDay(
        Seq((1L, "final")).toDF("id", "payload"), dir, t1)
      assert(spark.read.parquet(dir).count() == 2L) // 1 day-1 row + day-2
      assert(Streams.ledgerConsistent(spark, dir),
        "repeated backfill broke the ledger audit")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("histogram journal stream: standing quantile estimate == batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-hist-stream")
    try {
      val journal = s"$root/journal"
      val bounds = (1 until 100).map(_.toDouble).toArray // unit grid 1..99
      val b1 = (1 to 60).map(i => ("A", i.toDouble))
      val b2 = (61 to 100).map(i => ("A", i.toDouble))
      val in = MemoryStream[(String, Double)]
      val q = Streams.startHistogramJournal(in.toDF().toDF("k", "v"),
        journal, s"$root/ckpt", Seq("k"), "v", bounds)
      runBatches(q)(() => in.addData(b1: _*), () => in.addData(b2: _*))

      def est() = graft.engine.Rollup.quantileEstimate(spark, journal,
          Seq("k"), bounds, Seq(0.5))
        .head().getAs[Double]("est")
      // 100 uniform values on a unit grid: the rank-50 bucket holds value
      // 50 and reports its EXCLUSIVE upper edge 51 — within the one-grid-
      // step error bound of the true p50 (50.5)
      assert(est() >= 50.0 && est() <= 51.0,
        s"streamed histogram p50 was ${est()}")

      // at-least-once replay journals nothing new; estimate unchanged
      val before = est()
      val rows = spark.read.parquet(journal).count()
      Streams.histogramBatchIdempotent(b2.toDF("k", "v"), journal, 1L,
        Seq("k"), "v", bounds)
      assert(spark.read.parquet(journal).count() == rows)
      assert(est() == before)
      assert(Streams.rollupLedgerConsistent(spark, journal),
        "histogram journal ledger must audit clean")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("commit ledger: dedup-shrunk batches, legacy markers, compaction") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ledger")
    try {
      val dir = s"$root/tbl"
      val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
      // batch with an intra-batch EXACT duplicate: cleaning drops it, so
      // the marker must record the written count (2), not the input (3)
      Streams.appendBatchIdempotent(
        Seq((1L, "v"), (1L, "v"), (2L, "v")).toDF("id", "payload"),
        dir, batchId = 0L, at = Some(t1))
      assert(spark.read.parquet(dir).count() == 2)
      assert(Streams.ledgerConsistent(spark, dir),
        "marker must record post-cleaning rows, not raw batch count")

      // a legacy (empty) marker is skipped by the audit, not counted as 0
      val legacy = new org.apache.hadoop.fs.Path(dir, "_graft_commits/99")
      val fs = legacy.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(legacy, true).close()
      assert(Streams.ledgerConsistent(spark, dir),
        "unparsable legacy marker must not poison the audit")
      fs.delete(legacy, false)

      // compaction carries the ledger through the swap: the audit stays
      // exact (batch markers re-seed to 0; _compaction holds the count)
      // and a post-compact replay of an old batchId is still a no-op
      Streams.appendBatchIdempotent(
        Seq((2L, "v2")).toDF("id", "payload"), dir, batchId = 1L,
        at = Some(Timestamp.valueOf("2024-01-02 00:00:00")))
      val r = graft.engine.Pipeline.compact(spark, dir, Seq("id"))
      assert(r.ok)
      assert(spark.read.parquet(dir).count() == 2) // ids 1, 2 (latest)
      assert(Streams.ledgerConsistent(spark, dir),
        "ledger must survive compaction with an exact re-seed")
      val before = spark.read.parquet(dir).count()
      Streams.appendBatchIdempotent(
        Seq((1L, "v"), (2L, "v")).toDF("id", "payload"), dir,
        batchId = 0L, at = Some(t1))
      assert(spark.read.parquet(dir).count() == before,
        "replayed pre-compaction batchId must still be a no-op")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("startDedupJournal: streamed candidate pairs == full-corpus LSH; " +
      "replay and the crash seam both converge") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-dedup")
    try {
      val state = s"$root/state"
      // three batches; the duplicate text spans batches 0↔1 and 1↔2
      val dup1 = (0 until 12).map(i => s"alpha$i").mkString(" ")
      val dup2 = (0 until 12).map(i => s"beta$i").mkString(" ")
      def uniq(id: Long) = (0 until 12).map(i => s"only${id}x$i").mkString(" ")
      val b0 = Seq((1L, dup1), (2L, uniq(2)))
      val b1 = Seq((3L, dup1), (4L, dup2), (5L, uniq(5)))
      val b2 = Seq((6L, dup2), (7L, dup1))

      val in = MemoryStream[(Long, String)]
      val q = Streams.startDedupJournal(in.toDF().toDF("doc_id", "text"),
        state, s"$root/ckpt")
      runBatches(q)(() => in.addData(b0: _*), () => in.addData(b1: _*),
        () => in.addData(b2: _*))

      def streamedPairs() =
        spark.read.parquet(s"$state/pairs/*")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val allDocs = (b0 ++ b1 ++ b2).toDF("doc_id", "text")
      val full = graft.ext.Dedup.minhashPairs(allDocs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamedPairs() == full,
        "journal union must equal the full-corpus candidate set")
      assert(full.contains((1L, 3L)) && full.contains((4L, 6L)),
        "fixture must actually produce cross-batch duplicates")

      // clean replay: marker short-circuits, state unchanged
      Streams.dedupBatchIdempotent(b1.toDF("doc_id", "text"), state, 1L)
      assert(streamedPairs() == full)

      // crash seam: marker lost AFTER the state writes — replay recomputes
      // byte-identical output onto the same tagged paths and converges
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(state, "_graft_commits/2"),
        false)
      Streams.dedupBatchIdempotent(b2.toDF("doc_id", "text"), state, 2L)
      assert(streamedPairs() == full,
        "replay across the crash seam must converge, not duplicate")

      // a stray non-tag directory under bands/ (manual touch, external
      // tooling) must be IGNORED by the prior-band listing, not crash the
      // next batch — bare "b" once passed a vacuous isDigit check into
      // "".toLong
      fs.mkdirs(new org.apache.hadoop.fs.Path(state, "bands/b"))
      fs.mkdirs(new org.apache.hadoop.fs.Path(state, "bands/junk"))
      fs.delete(new org.apache.hadoop.fs.Path(state, "_graft_commits/2"),
        false)
      Streams.dedupBatchIdempotent(b2.toDF("doc_id", "text"), state, 2L)
      assert(streamedPairs() == full,
        "stray bands/ entries must not change the journal")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("decontam monitor: per-batch flag union == the one-shot n-gram " +
      "sweep (text-keyed), and replay recomputes identical flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct}
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-decon")
    try {
      val dir = "/root/testdata/sf0.001"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val evalDocs = docs.filter(col("doc_id") % 7 === 0)
      val train = docs.filter(col("doc_id") % 7 =!= 0)
      Streams.writeEvalGrams(evalDocs, s"$root/eval")

      val rows = train.collect().map(r => (r.getLong(0), r.getString(1)))
      val b0 = rows.filter(_._1 % 2 == 0).toSeq
      val b1 = rows.filter(_._1 % 2 == 1).toSeq
      val in = MemoryStream[(Long, String)]
      val q = Streams.startDecontamMonitor(in.toDF().toDF("doc_id", "text"),
        s"$root/eval", s"$root/flags", s"$root/ckpt")
      runBatches(q)(() => in.addData(b0: _*), () => in.addData(b1: _*))

      def streamed() = spark.read.parquet(s"$root/flags/b0", s"$root/flags/b1")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // one-shot twin joins on the gram TEXT — equality also proves the
      // monitor's 8-byte hash keys lossless on this corpus
      val evalG = graft.ext.Dedup.docShingles(evalDocs, "doc_id", "text")
        .select("shingle").distinct()
      val oneShot = graft.ext.Dedup.docShingles(train, "doc_id", "text")
        .join(evalG, "shingle")
        .groupBy("doc_id").agg(countDistinct("shingle").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val flags = streamed()
      assert(flags.nonEmpty, "fixture must actually produce contamination")
      assert(flags == oneShot,
        "flag union must equal the one-shot sweep over the same corpus")

      // at-least-once replay: no ledger, no cross-batch state — the
      // recomputed batch must land byte-equivalent on its own path
      Streams.decontamBatchIdempotent(b1.toDF("doc_id", "text"),
        s"$root/eval", s"$root/flags", 1L)
      assert(streamed() == flags,
        "replayed batch must recompute identical flags")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("ivf journal: streamed assignments == whole-corpus assignClusters; " +
      "marker makes replay a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-ivf")
    try {
      val dir = "/root/testdata/sf0.001"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      // Codebook: the batch IVF family's seed vectors, written once.
      emb.filter(col("vec_id") < 10)
        .select("vec_id", "embedding")
        .write.parquet(s"$root/cents")
      val rows = emb.filter(col("vec_id") >= 10).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val b0 = rows.filter(_._1 % 2 == 0).toSeq
      val b1 = rows.filter(_._1 % 2 == 1).toSeq
      val in = MemoryStream[(Long, Seq[Float])]
      val q = Streams.startIvfJournal(
        in.toDF().toDF("vec_id", "embedding"),
        s"$root/cents", s"$root/state", s"$root/ckpt")
      runBatches(q)(() => in.addData(b0: _*), () => in.addData(b1: _*))

      def journal() = spark.read
        .parquet(s"$root/state/asgn/b0", s"$root/state/asgn/b1")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val streamed = journal()
      // Whole-corpus twin: the SAME assignment rule over the base table
      // (centroids assign to themselves there; restrict to the streamed
      // ids for the compare).
      val batchTwin = graft.ext.Similarity.assignClusters(
          emb, "vec_id", "embedding", col("vec_id") < 10)
        .filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("cluster_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed.nonEmpty && streamed == batchTwin,
        "journal union must equal the batch assignment")

      // Committed marker: a replay of batch 1 is a no-op even with the
      // batch's data mutated (the marker, not content, gates the write).
      Streams.ivfBatchIdempotent(b1.take(1).toDF("vec_id", "embedding"),
        s"$root/cents", s"$root/state", 1L)
      assert(journal() == streamed, "committed batch must not rewrite")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("startKsW1Monitor: journal-only KS and W1 verdicts equal the " +
      "batch oracle rows; the at-least-once journal seam replays exactly") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ksw1-mon")
    try {
      val dir = "/root/testdata/sf0.001"
      val evs = spark.read.parquet(s"$dir/events.parquet")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .as[Event].collect()
      // the cut hour splits ACROSS batches: the journal must reassemble
      // both periods from per-batch partials
      val (b0, b1) = evs.partition(_.event_id % 2 == 0)
      val in = MemoryStream[Event]
      val q = Streams.startKsW1Monitor(in.toDF(), s"$root/journal",
        s"$root/verdict", s"$root/ck", "event_type", "ts", "value",
        "2024-01-16 00:00:00")
      runBatches(q)(
        () => in.addData(b0.toSeq),
        () => in.addData(b1.toSeq))
      def rows(p: String) = spark.read.parquet(p)
        .collect().map(_.toSeq).toSet
      val ksGot = rows(s"$root/verdict/ks/b1")
      val w1Got = rows(s"$root/verdict/w1/b1")
      assert(ksGot.nonEmpty && w1Got.nonEmpty)
      // the streaming verdict IS the batch query's row set — same fixture,
      // same cut, same shared fold (Rollup.ksReport / w1Report)
      assert(ksGot === graft.SparkEntry.queries("q_ks_drift")(spark, dir)
        .collect().map(_.toSeq).toSet)
      assert(w1Got ===
        graft.SparkEntry.queries("q_wasserstein_drift")(spark, dir)
          .collect().map(_.toSeq).toSet)
      // at-least-once seam: crash BETWEEN journal append and marker —
      // the replay re-appends the batch's partials (byte-identical
      // integers), and the structural collapse keeps both verdicts exact
      val marker = new java.io.File(s"$root/journal/_graft_commits/1")
      assert(marker.delete(), "seam setup: marker must exist")
      Streams.ksW1BatchIdempotent(b1.toSeq.toDF(), s"$root/journal",
        s"$root/verdict", 1L, "event_type", "ts", "value",
        "2024-01-16 00:00:00")
      assert(rows(s"$root/verdict/ks/b1") === ksGot,
        "replayed KS verdict must be byte-identical")
      assert(rows(s"$root/verdict/w1/b1") === w1Got,
        "replayed W1 verdict must be byte-identical")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("startEwmaMonitor: journal-only chart matches the hand-computed " +
      "dyadic smoother; committed batches replay as no-ops") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ewma-mon")
    try {
      def ev(id: Long, typ: String, v: Double, hour: Int, minute: Int) =
        Streams.Event(id, 1L, typ, v,
          Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00"))
      val in = MemoryStream[Streams.Event]
      val q = Streams.startEwmaMonitor(in.toDF(), s"$root/journal",
        s"$root/verdict", s"$root/ck", "event_type", "ts", "value")
      // hour 10 of `click` SPLITS across the two batches — the journal
      // must reassemble it into one hourly total before rounding
      runBatches(q)(
        () => in.addData(ev(1, "click", 10.00, 10, 5),
          ev(2, "click", 2.50, 10, 40), ev(3, "click", 1.25, 11, 10)),
        () => in.addData(ev(4, "click", 4.00, 11, 30),
          ev(5, "click", 100.00, 12, 0), ev(6, "view", 3.00, 10, 0)))
      val got = spark.read.parquet(s"$root/verdict/b1")
        .collect().map(r => (r.getString(0),
          r.getTimestamp(1).toString.substring(11, 13), r.getLong(2),
          r.getDouble(3), r.getBoolean(4))).toSet
      // click hourly cents: h10 = 1250 (10.00 + 2.50, cross-batch),
      // h11 = 525 (1.25 + 4.00), h12 = 10000. Dyadic weights 128/64/32:
      //   h10: 1250·128/128/100 = 12.5
      //   h11: (525·128 + 1250·64)/(192·100) = 7.6667; no spike
      //   h12: (10000·128 + 525·64 + 1250·32)/(224·100) = 60.4286;
      //        spike: 10000·192 > 2·147200 — the jump trips the chart
      assert(got === Set(
        ("click", "10", 1250L, 12.5, false),
        ("click", "11", 525L, 7.6667, false),
        ("click", "12", 10000L, 60.4286, true),
        ("view", "10", 300L, 3.0, false)))
      // committed batch 1 replays as a no-op even with mutated content
      val files0 = new java.io.File(s"$root/journal").listFiles()
        .count(_.getName.endsWith(".parquet"))
      Streams.ewmaBatchIdempotent(
        Seq(ev(99, "click", 999.0, 12, 1)).toDF(),
        s"$root/journal", s"$root/verdict", 1L, "event_type", "ts",
        "value")
      val files1 = new java.io.File(s"$root/journal").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files0 == files1, "committed batch must not re-journal")
      val again = spark.read.parquet(s"$root/verdict/b1")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSet
      assert(again == got.map(x => (x._1, x._3)),
        "replayed verdict must be identical")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("startUrlDedupJournal: the journal fold equals the one-shot " +
      "q_dedup_url over the same corpus, through an at-least-once " +
      "replay of a committed batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-urls")
    try {
      val dir = "/root/testdata/sf0.001"
      // the SAME synthesized crawl q_dedup_url canonicalizes, split into
      // three arriving batches by id residue (arbitrary, disjoint)
      val crawl = graft.engine.Sources.table(spark, dir, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          graft.queries.Docs.synthUrl.as("url"))
        .as[(Long, String)].collect().toSeq
      val batches = (0 to 2).map(r => crawl.filter(_._1 % 3 == r))
      val in = MemoryStream[(Long, String)]
      val q = Streams.startUrlDedupJournal(
        in.toDF().toDF("doc_id", "url"), s"$root/state", s"$root/ckpt")
      runBatches(q)(batches.map(b => () => in.addData(b: _*)): _*)

      def fold() = Streams.urlDedupFromJournal(spark, s"$root/state")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = graft.queries.Docs.queries("q_dedup_url")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(fold() == want,
        "journal fold must equal the one-shot batch answer")

      // foreachBatch is at-least-once: a replayed COMMITTED batch (even
      // with mutated content) must be a no-op behind the commit marker
      Streams.urlDedupBatchIdempotent(
        batches(1).take(3).toDF("doc_id", "url"), s"$root/state",
        batchId = 1L)
      assert(fold() == want, "replayed committed batch must be a no-op")
      // a half-written batch with NO marker is invisible to the fold
      batches(2).take(2).toDF("doc_id", "url")
        .write.mode("overwrite").parquet(s"$root/state/urls/b99")
      assert(fold() == want, "uncommitted batch dir must be ignored")

      // COMPACTION (the journal's growth bound): fold the committed
      // batch dirs into ONE `_compacted` snapshot. The fold answer is
      // unchanged, the half-batch b99 is dropped (a replay recomputes
      // it — same semantics as before compaction), and the commit
      // markers survive OUTSIDE the swapped dir, so an at-least-once
      // replay of a COMPACTED batch is still a no-op.
      val rep = Streams.compactUrlDedupJournal(spark, s"$root/state")
      assert(rep.ok, rep.detail)
      val dirs = new java.io.File(s"$root/state/urls")
        .listFiles().map(_.getName).filterNot(_.startsWith(".")).toSet
      assert(dirs == Set("_compacted"),
        s"expected one snapshot dir after compaction, got $dirs")
      assert(fold() == want,
        "fold through the compacted snapshot must equal the one-shot")
      Streams.urlDedupBatchIdempotent(
        batches(0).take(3).toDF("doc_id", "url"), s"$root/state",
        batchId = 0L)
      assert(fold() == want,
        "replay of a compacted committed batch must remain a no-op")
      // a batch arriving AFTER compaction merges onto the snapshot:
      // re-ingesting 5 known urls under a fresh id bumps exactly those
      // canon groups' counts (min first_doc unchanged — these doc_ids
      // already participated)
      val extra = batches(0).take(5)
      Streams.urlDedupBatchIdempotent(
        extra.toDF("doc_id", "url"), s"$root/state", batchId = 100L)
      val canonOf = extra.toDF("doc_id", "url")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          graft.queries.Docs.urlCanon(
            org.apache.spark.sql.functions.col("url")).as("c"))
        .collect().map(_.getString(1))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val wantMerged = want.map { case (c, n, first) =>
        (c, n + canonOf.getOrElse(c, 0L), first) }
      assert(fold() == wantMerged,
        "post-compaction batch must merge onto the snapshot")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("batchTag parses the full Long id range and rejects non-tags " +
      "(the r18 `length <= 19` bound was off by one: Long.MaxValue is " +
      "19 digits, dir-name length 20)") {
    assert(Streams.batchTag("b0").contains(0L))
    assert(Streams.batchTag("b123456789012345678").contains(123456789012345678L))
    // 19-digit ids inside the Long range parse (the old bound dropped them)
    assert(Streams.batchTag(s"b${Long.MaxValue}").contains(Long.MaxValue))
    // past Long.MaxValue the parse itself rejects — no wraparound id
    assert(Streams.batchTag("b9223372036854775808").isEmpty)
    assert(Streams.batchTag("b").isEmpty)
    assert(Streams.batchTag("b12x").isEmpty)
    assert(Streams.batchTag("_compacted").isEmpty)
    assert(Streams.batchTag("12").isEmpty)
  }

  test("startLangidMonitor: the confusion-journal fold equals the " +
      "one-shot q_langid_confusion under the same static model, " +
      "through an at-least-once replay of a committed batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-langid")
    try {
      val dir = "/root/testdata/sf0.001"
      // static model: trained on EXACTLY the rows the batch query
      // trains on (Docs.langidTrain — the shared accessor is the pin's
      // precondition)
      Streams.writeLangidModel(
        graft.queries.Docs.langidTrain(spark, dir), s"$root/model")
      val docs = graft.engine.Sources.table(spark, dir, "documents")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.col("text"))
        .as[(Long, String, String)].collect().toSeq
      val batches = (0 to 2).map(r => docs.filter(_._1 % 3 == r))
      val in = MemoryStream[(Long, String, String)]
      val q = Streams.startLangidMonitor(
        in.toDF().toDF("doc_id", "lang", "text"),
        s"$root/model", s"$root/state", s"$root/ckpt")
      runBatches(q)(batches.map(b => () => in.addData(b: _*)): _*)

      def fold() = Streams
        .langidConfusionFromJournal(spark, s"$root/state")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getBoolean(3)))
        .toSet
      val want = graft.queries.Docs
        .queries("q_langid_confusion")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getBoolean(3)))
        .toSet
      assert(fold() == want,
        "confusion fold must equal the one-shot batch answer")

      // at-least-once: a replayed COMMITTED batch (mutated content)
      // must be a no-op behind the commit marker
      Streams.langidBatchIdempotent(
        batches(1).take(4).toDF("doc_id", "lang", "text"),
        s"$root/model", s"$root/state", batchId = 1L)
      assert(fold() == want, "replayed committed batch must be a no-op")
      // a half-written batch with NO marker is invisible to the fold
      batches(2).take(2).toDF("doc_id", "lang", "text")
        .write.mode("overwrite").parquet(s"$root/state/confusion/b99")
      assert(fold() == want, "uncommitted batch dir must be ignored")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }
}

/** Minimal GroupState stub for direct unit-testing of the session fold
  * (Spark's TestGroupState covers the same need but is tied to internal
  * construction; this keeps the test self-contained).
  */
class FakeGroupState[S](initial: Option[S])
    extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = initial
  private var removed = false
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(newValue: S): Unit = { v = Some(newValue) }
  override def remove(): Unit = { v = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
