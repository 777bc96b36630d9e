package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PgCompatSpec extends AnyFunSuite {

  test("pgSubstring matches the reference pg substring.test goldens") {
    val spark = TestSpark.spark
    import spark.implicits._
    // (string, from, len) -> expected, verbatim from
    // tests/sqllogic/pg/simple/substring.test
    val cases = Seq(
      ("abcde", 1, 5, "abcde"),
      ("abcde", 0, 5, "abcd"),
      ("abcde", -10, 5, ""),
      ("abcde", 1, 1, "a"),
      ("abcdefghijklmnop", -3, 5, "a"),
      ("abcdefghijklmnop", 2, 5, "bcdef"))
    val got = cases.toDF("s", "f", "l", "want")
      .select(PgCompat.pgSubstring(col("s"), col("f"), col("l")).as("got"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }
}
