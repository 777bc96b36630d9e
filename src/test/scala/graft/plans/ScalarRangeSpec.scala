package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** DuckDB scalar range() semantics (r18 ADVICE #1): END-EXCLUSIVE and []
  * for every empty range — including explicit-step empties, which the bare
  * Sequence mapping used to reject with 'illegal sequence boundaries', and
  * non-literal negative steps, which computed wrong bounds. */
class ScalarRangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def range1(q: String): Seq[Int] =
    spark.sql(s"SELECT $q AS r").head().getSeq[Int](0)

  test("end-exclusive happy paths keep their values and element type") {
    assert(range1("range(3)") == Seq(0, 1, 2))
    assert(range1("range(2, 5)") == Seq(2, 3, 4))
    assert(range1("range(1, 10, 3)") == Seq(1, 4, 7))
    assert(range1("range(10, 1, -3)") == Seq(10, 7, 4))
    // element type stays INT for int arguments — declared-query schemas
    // (ta_*, dedup_*, pipeline_* unnest positions) depend on it
    val dt = spark.sql("SELECT range(3) AS r").schema("r").dataType
    assert(dt == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false))
  }

  test("empty ranges return [] like DuckDB, never throw") {
    assert(range1("range(0)").isEmpty)
    assert(range1("range(-3)").isEmpty)
    assert(range1("range(5, 5)").isEmpty)
    assert(range1("range(5, 2)").isEmpty)
    assert(range1("range(5, 5, 2)").isEmpty)  // threw pre-fix
    assert(range1("range(1, 5, -1)").isEmpty) // threw pre-fix
    assert(range1("range(5, 1, 1)").isEmpty)  // threw pre-fix
  }

  test("non-literal steps take the runtime sign branch") {
    val rows = spark.sql(
      """SELECT s, range(10, 1, s) AS r FROM VALUES (-3), (-20) t(s)
        |ORDER BY s DESC""".stripMargin).collect()
    assert(rows(0).getSeq[Int](1) == Seq(10, 7, 4))
    assert(rows(1).getSeq[Int](1) == Seq(10))
    val asc = spark.sql(
      "SELECT range(1, 5, s) AS r FROM VALUES (2) t(s)").head().getSeq[Int](0)
    assert(asc == Seq(1, 3))
    val emptyNl = spark.sql(
      "SELECT range(5, 1, s) AS r FROM VALUES (2) t(s)").head().getSeq[Int](0)
    assert(emptyNl.isEmpty)
  }
}
