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

  test("pgBoolParse accepts exactly pg's prefix forms") {
    val spark = TestSpark.spark
    import spark.implicits._
    // pg bool input rules: unique prefixes of true/false/yes/no, on/off,
    // 1/0; whitespace-trimmed, case-insensitive; 'o' alone is ambiguous
    val cases: Seq[(String, java.lang.Boolean)] = Seq(
      ("t", true), ("tr", true), ("TRUE", true), ("y", true), ("YeS", true),
      ("on", true), ("1", true), (" true ", true),
      ("f", false), ("fal", false), ("n", false), ("No", false),
      ("of", false), ("off", false), ("0", false),
      ("o", null), ("junk", null), ("10", null), ("truex", null), ("", null))
    val got = cases.toDF("raw", "want")
      .select(col("raw"), PgCompat.pgBoolParse(col("raw")).as("got"), col("want"))
      .collect()
    got.foreach { r =>
      val g = if (r.isNullAt(1)) null else java.lang.Boolean.valueOf(r.getBoolean(1))
      val w = if (r.isNullAt(2)) null else java.lang.Boolean.valueOf(r.getBoolean(2))
      assert(g == w, s"input '${r.getString(0)}': got $g want $w")
    }
  }
}
