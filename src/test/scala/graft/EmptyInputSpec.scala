package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input sweep: every registered query must plan AND execute on
  * fully empty fixture tables (schema preserved, zero rows). An engine that
  * NPEs or throws on an empty partition/day/table is not production-safe —
  * empty inputs are routine (a day with no events, a fresh corpus, a filter
  * that matched nothing upstream).
  */
class EmptyInputSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private var emptyRoot: Option[java.nio.file.Path] = None

  private lazy val emptyDir: String = {
    val root = java.nio.file.Files.createTempDirectory("graft-empty")
    emptyRoot = Some(root)
    for (t <- tables)
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$root/$t.parquet")
    root.toString
  }

  override def afterAll(): Unit = emptyRoot.foreach { p =>
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }

  test("every registered query executes on empty inputs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, emptyDir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case scala.util.control.NonFatal(e) =>
            Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
