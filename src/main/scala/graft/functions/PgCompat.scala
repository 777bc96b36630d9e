package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Postgres-conformance scalar semantics the underlying engines get wrong
  * natively (reference: tests/sqllogic/pg/simple/substring.test — its pg
  * layer reimplements these on top of DuckDB, whose own substring treats a
  * negative start as from-the-end, and Spark's treats 0 as 1).
  */
object PgCompat {

  /** pg `SUBSTRING(s, from, len)`: the character window is
    * [from, from+len) intersected with [1, ∞) — so a zero/negative `from`
    * CLAMPS and eats into the length instead of wrapping or being treated
    * as 1. `SUBSTRING('abcde', 0, 5)` = 'abcd'; `('abcdefghijklmnop',
    * -3, 5)` = 'a'; an empty intersection yields ''. Pure builtin
    * composition — codegen'd, no UDF. */
  def pgSubstring(src: Column, from: Column, len: Column): Column = {
    val start = greatest(from, lit(1))
    val n = (from + len) - start // window end is exclusive
    when(n <= 0, lit("")).otherwise(src.substr(start, n))
  }

  /** pg array TEXT rendering of a string array (reference:
    * tests/sqllogic/pg/any/conformance/arrays.test — what a pg client sees
    * over the wire): `{a,b}`, elements quoted iff empty, equal to `NULL`
    * (any case), or containing whitespace/comma/brace/quote/backslash;
    * `\` and `"` are backslash-escaped inside quotes; a SQL NULL element
    * renders bare `NULL` (so `{"NULL",NULL}` distinguishes the literal
    * string from the missing value). Builtin composition, codegen'd. */
  def pgArrayText(arr: Column): Column = {
    val rendered = transform(arr, e => {
      val esc = regexp_replace(regexp_replace(e, "\\\\", "\\\\\\\\"),
        "\"", "\\\\\"")
      val needsQuote = e === "" || lower(e) === "null" ||
        e.rlike("[\\s,{}\"\\\\]")
      when(e.isNull, lit("NULL"))
        .when(needsQuote, concat(lit("\""), esc, lit("\"")))
        .otherwise(e)
    })
    concat(lit("{"), concat_ws(",", rendered), lit("}"))
  }
}
