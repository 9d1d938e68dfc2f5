package graft.queries

/** Shared scratch-dir plumbing for queries that materialize state at
  * build time (incremental tables, dedup journals, bucketed layouts).
  *
  * One JVM-wide cache and ONE exit hook with a plain file walk: per-build
  * hooks would accumulate a thread each, and going through the Hadoop
  * FileSystem at exit races Hadoop's own shutdown hook closing the cached
  * filesystem. Cache keys are (purpose, fixture dir) — the built state is
  * a pure function of the fixture, so sessions share it, and repeated
  * sweeps (Bench warmup + timed pass, PlanSpec registry scans,
  * EmptyInputSpec) reuse one build instead of leaking a temp dir per
  * invocation. computeIfAbsent keeps concurrent test suites from
  * double-building.
  */
private[queries] object Scratch {

  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  private lazy val cleanupHook: Unit = {
    sys.addShutdownHook {
      dirs.forEach { p =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    ()
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  /** A fresh temp dir, tracked for exit-time cleanup. */
  def newDir(prefix: String): String = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Build-once-per-key: `build` receives a fresh tracked temp dir and
    * returns the path to hand to readers (usually that dir or a child).
    */
  def cached(key: String)(build: String => String): String =
    cache.computeIfAbsent(key, _ => build(newDir("graft-scratch")))
}
