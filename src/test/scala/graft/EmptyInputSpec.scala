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

  override def afterAll(): Unit =
    (emptyRoot.toSeq ++ nullRoot.toSeq).foreach { p =>
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }

  private def sweep(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case scala.util.control.NonFatal(e) =>
          Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }

  test("every registered query executes on empty inputs") {
    assert(sweep(emptyDir).isEmpty)
  }

  test("every registered query executes with all-nullable-null rows") {
    // 20 real rows per table plus one row where every nullable column is
    // NULL — the fixtures are null-free, so nothing else exercises the
    // null path of each expression chain.
    import org.apache.spark.sql.Row
    val root = java.nio.file.Files.createTempDirectory("graft-nulls")
    nullRoot = Some(root)
    for (t <- tables) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(20)
      val nullRow = Row.fromSeq(df.schema.fields.map(_ => null).toSeq)
      val withNulls = df.unionByName(spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.List.of(nullRow)),
        org.apache.spark.sql.types.StructType(
          df.schema.fields.map(_.copy(nullable = true)))))
      withNulls.write.mode("overwrite").parquet(s"$root/$t.parquet")
    }
    assert(sweep(root.toString).isEmpty)
  }

  private var nullRoot: Option[java.nio.file.Path] = None
}
