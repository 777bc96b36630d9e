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

  test("pgArrayText matches the reference arrays.test goldens") {
    val spark = TestSpark.spark
    import spark.implicits._
    // expected renderings verbatim from pg/any/conformance/arrays.test
    val cases = Seq(
      (Seq("a", "b", "c"), "{a,b,c}"),
      (Seq("a b", "c,d", ""), """{"a b","c,d",""}"""),
      (Seq("NULL", null), """{"NULL",NULL}"""),
      (Seq("1", null, "3"), "{1,NULL,3}"),
      (Seq.empty[String], "{}"),
      (Seq("""back\slash""", """qu"ote"""), """{"back\\slash","qu\"ote"}"""))
    val got = cases.toDF("a", "want")
      .select(PgCompat.pgArrayText(col("a")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }
}
