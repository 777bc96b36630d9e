package graft.sqllogic

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runs every `.test` file in src/test/resources/sqllogic through the
  * SqlLogic runner — the reference's primary conformance format
  * (sqllogictest) executed against the SparkSession surface. */
@graft.SlowTest
class SqlLogicSpec extends AnyFunSuite {
  private val dir = Paths.get("src/test/resources/sqllogic")

  Files.list(dir).iterator().asScala
    .filter(_.toString.endsWith(".test")).toSeq.sortBy(_.toString)
    .foreach { f =>
      test(s"sqllogic: ${f.getFileName}") {
        val content = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        val fails = SqlLogic.run(TestSpark.spark, f.getFileName.toString,
          content, TestSpark.sfDir)
        assert(fails.isEmpty, fails.mkString("\n"))
      }
    }
}
