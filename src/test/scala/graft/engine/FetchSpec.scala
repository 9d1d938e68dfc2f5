package graft.engine

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S1 retry/backoff semantics against a local stub server (mirrors the
  * reference's mocked session tests,
  * /root/reference/tests/test_api_extraction.py:41-138).
  */
class FetchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val hits = new AtomicInteger(0)
  private val csv = "YearStart,Topic\n2020,Asthma\n2021,Diabetes\n"

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", ex => respond(ex, 200, csv))
    server.createContext("/flaky", ex => {
      val n = hits.incrementAndGet()
      if (n < 3) respond(ex, 503, "unavailable") else respond(ex, 200, csv)
    })
    server.createContext("/throttled", ex => respond(ex, 429, "slow down"))
    server.createContext("/missing", ex => respond(ex, 404, "nope"))
    server.createContext("/empty", ex => respond(ex, 200, ""))
    server.createContext("/headeronly",
      ex => respond(ex, 200, "YearStart,Topic\n"))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-fetch").resolve(name).toString

  private val fast = Fetch.Config(backoffBaseMillis = 1L)

  test("nonBlankLines: counts content lines, ignores blanks and whitespace") {
    def n(s: String) = Fetch.nonBlankLines(s.getBytes("UTF-8"), atLeast = 10)
    assert(n("") == 0)
    assert(n("\n\n  \n\t\r\n") == 0)
    assert(n("header\n") == 1)
    assert(n("header") == 1) // no trailing newline still counts
    assert(n("h\nrow1\nrow2\n") == 3)
    assert(n("h\r\nrow1\r\n") == 2) // CRLF
    // early exit at the atLeast bound
    assert(Fetch.nonBlankLines("a\nb\nc\nd\n".getBytes, atLeast = 2) == 2)
  }

  test("happy path: single attempt, body lands on disk") {
    val out = tmp("ok.csv")
    val r = Fetch.fetchToLanding(s"$base/ok", out, fast)
    assert(r.ok && r.attempts == 1 && r.status == 200)
    assert(new String(Files.readAllBytes(r.path.get)) == csv)
  }

  test("503s are retried with exponential backoff until success") {
    hits.set(0)
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val r = Fetch.fetchToLanding(s"$base/flaky", tmp("flaky.csv"),
      Fetch.Config(backoffBaseMillis = 10L), sleeps.append(_))
    assert(r.ok && r.attempts == 3)
    assert(sleeps.toSeq == Seq(10L, 20L)) // 2 backoffs, doubling
  }

  test("429 exhausts retries and reports failure") {
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val r = Fetch.fetchToLanding(s"$base/throttled", tmp("t.csv"),
      Fetch.Config(maxRetries = 2, backoffBaseMillis = 5L), sleeps.append(_))
    assert(!r.ok && r.attempts == 3 && r.status == 429)
    assert(sleeps.toSeq == Seq(5L, 10L))
  }

  test("404 is non-retryable: fail immediately") {
    val r = Fetch.fetchToLanding(s"$base/missing", tmp("m.csv"), fast)
    assert(!r.ok && r.attempts == 1 && r.status == 404)
  }

  test("empty dataset is a hard failure (P7 guard)") {
    val r = Fetch.fetchToLanding(s"$base/empty", tmp("e.csv"), fast)
    assert(!r.ok && r.detail.contains("empty"))
  }

  test("header-only body (trailing newline) is still an empty dataset") {
    val r = Fetch.fetchToLanding(s"$base/headeronly", tmp("h.csv"), fast)
    assert(!r.ok && r.detail.contains("empty"))
  }

  test("connection errors retry then fail") {
    val r = Fetch.fetchToLanding("http://127.0.0.1:1/never", tmp("c.csv"),
      Fetch.Config(maxRetries = 1, backoffBaseMillis = 1L))
    assert(!r.ok && r.attempts == 2 && r.status == -1)
  }

  test("runFromUrl chains fetch into the full pipeline") {
    val spark = TestSpark.spark
    val root = Files.createTempDirectory("graft-fetch-pipe")
    val report = Pipeline.runFromUrl(spark, s"$base/ok",
      root.resolve("landing.csv").toString,
      root.resolve("staging").toString,
      root.resolve("analytics").toString, None,
      _ => Seq(Checks.rowCountMin(1)), fetchConfig = fast)
    assert(report.exitCode == 0)
    assert(report.stages.map(_.name) ==
      Seq("fetch", "extract", "load", "validate"))
    assert(spark.read.parquet(root.resolve("analytics").toString).count() == 2)
  }

  test("runFromUrl stops at a failed fetch") {
    val spark = TestSpark.spark
    val root = Files.createTempDirectory("graft-fetch-pipe2")
    val report = Pipeline.runFromUrl(spark, s"$base/missing",
      root.resolve("landing.csv").toString,
      root.resolve("staging").toString,
      root.resolve("analytics").toString, None,
      _ => Seq(Checks.rowCountMin(1)), fetchConfig = fast)
    assert(report.exitCode == 1)
    assert(report.stages.map(_.name) == Seq("fetch"))
  }
}
