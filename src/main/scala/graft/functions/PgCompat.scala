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
}
