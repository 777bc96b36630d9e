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

  /** pg boolean TEXT parsing (reference: pg/simple/boolean.test; pg accepts
    * any unique PREFIX of true/false/yes/no, plus on/off and 1/0, case- and
    * whitespace-insensitive — so 't', 'tr', 'y', 'n', 'of' are all valid
    * and 'o' alone is ambiguous/invalid). Unparseable input yields NULL
    * (pg raises; a vectorized pipeline nulls and filters). */
  def pgBoolParse(raw: Column): Column = {
    val v = lower(trim(raw))
    val nonEmpty = length(v) >= 1
    when(nonEmpty && (startswith(lit("true"), v) || startswith(lit("yes"), v) ||
        v === "on" || v === "1"), lit(true))
      .when(nonEmpty && (startswith(lit("false"), v) || startswith(lit("no"), v) ||
        (length(v) >= 2 && startswith(lit("off"), v)) || v === "0"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** pg boolean TEXT rendering: 't' / 'f' (what a pg client sees). */
  def pgBoolText(b: Column): Column =
    when(b.isNull, lit(null).cast("string"))
      .when(b, lit("t")).otherwise(lit("f"))
}
