package graft.sqllogic

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** FAST-TIER smoke slice of the sqllogic corpus (VERDICT r19 #1): the full
  * 146-file corpus lives in [[SqlLogicSpec]], which is tagged
  * `@graft.SlowTest` because it alone outgrows the driver's `sbt test`
  * window. This suite keeps a representative cross-section — scan/filter
  * semantics, catalog DDL/DML, one index build + drive, scorer top-k, the
  * CTE-multiref claim shape — in the default tier so a regression in the
  * hot paths still fails plain `sbt test`. The slice must stay cheap:
  * every file added here is paid on every driver verify run.
  */
class SqlLogicSmokeSpec extends AnyFunSuite {
  private val dir = Paths.get("src/test/resources/sqllogic")

  private val slice = Seq(
    "null_semantics.test",
    "inverted_index_basic.test",
    "catalog_checks.test",
    "dml_returning.test",
    "duck_statements.test",
    "scorers_topk.test",
    "inverted_index_cte_multiref.test")

  slice.foreach { name =>
    test(s"sqllogic smoke: $name") {
      val f = dir.resolve(name)
      val content = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      val fails = SqlLogic.run(TestSpark.spark, name, content, TestSpark.sfDir)
      assert(fails.isEmpty, fails.mkString("\n"))
    }
  }
}
