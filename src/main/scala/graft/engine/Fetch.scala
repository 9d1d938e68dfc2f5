package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration

/** Reference S1 front door: HTTP GET of the source CSV into the landing
  * dir, with the reference's retry policy (3 retries, exponential backoff,
  * retry on 429/500/502/503/504, 180 s timeout — /root/reference/
  * data_extractor.py:163-179) and its empty-dataset guard (:199-200).
  *
  * Deliberately pre-Spark plain Scala: the fetch is a driver-side I/O step
  * that materializes the landing file; everything after
  * (`Sources.readCsvInferred` onward) is a lazy distributed plan. At scale
  * the landing URI would be object storage and this step a ranged/parallel
  * download, but the retry semantics live here either way.
  */
object Fetch {

  final case class Config(
      timeout: Duration = Duration.ofSeconds(180),
      maxRetries: Int = 3,
      backoffBaseMillis: Long = 1000L,
      retryStatuses: Set[Int] = Set(429, 500, 502, 503, 504))

  final case class Result(ok: Boolean, status: Int, attempts: Int,
      bytes: Long, path: Option[Path], detail: String)

  /** Count non-blank lines, stopping once `atLeast` are found (no string
    * materialization of a potentially large body).
    */
  private[engine] def nonBlankLines(body: Array[Byte], atLeast: Int): Int = {
    var lines = 0
    var hasContent = false
    var i = 0
    while (i < body.length && lines < atLeast) {
      val b = body(i)
      if (b == '\n') {
        if (hasContent) lines += 1
        hasContent = false
      } else if (b != '\r' && b != ' ' && b != '\t') hasContent = true
      i += 1
    }
    if (hasContent && lines < atLeast) lines += 1
    lines
  }

  /** GET `url` into `landingFile`. `sleep` is injectable so tests don't
    * wait out real backoffs.
    */
  def fetchToLanding(url: String, landingFile: String,
      config: Config = Config(),
      sleep: Long => Unit = Thread.sleep): Result = {
    val client = HttpClient.newBuilder()
      .connectTimeout(config.timeout).build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(config.timeout).GET().build()

    var attempt = 0
    var lastDetail = ""
    var lastStatus = -1
    while (attempt <= config.maxRetries) {
      attempt += 1
      val resp =
        try Right(client.send(req, HttpResponse.BodyHandlers.ofByteArray()))
        catch { case e: java.io.IOException => Left(e.getMessage) }
      resp match {
        case Right(r) if r.statusCode() == 200 =>
          val body = r.body()
          // P7 guard: an empty or header-only dataset is a hard failure —
          // at least two non-blank lines (header + one data row) required.
          if (nonBlankLines(body, atLeast = 2) < 2)
            return Result(ok = false, 200, attempt, body.length.toLong, None,
              "empty API dataset")
          // the landing write can fail independently of the fetch (full or
          // read-only disk) — report it as a failed Result, not an escaped
          // exception breaking the stage-report contract
          try {
            val p = Paths.get(landingFile)
            Option(p.getParent).foreach(Files.createDirectories(_))
            Files.write(p, body)
            return Result(ok = true, 200, attempt, body.length.toLong,
              Some(p), "fetched")
          } catch {
            case e: java.io.IOException =>
              return Result(ok = false, 200, attempt, body.length.toLong,
                None, s"landing write failed: ${e.getMessage}")
          }
        case Right(r) if !config.retryStatuses(r.statusCode()) =>
          return Result(ok = false, r.statusCode(), attempt, 0, None,
            s"non-retryable HTTP ${r.statusCode()}")
        case Right(r) =>
          lastStatus = r.statusCode()
          lastDetail = s"HTTP ${r.statusCode()}"
        case Left(msg) =>
          lastStatus = -1
          lastDetail = s"connection error: $msg"
      }
      if (attempt <= config.maxRetries)
        sleep(config.backoffBaseMillis * (1L << (attempt - 1)))
    }
    Result(ok = false, lastStatus, attempt, 0, None,
      s"retries exhausted after $attempt attempts: $lastDetail")
  }
}
