package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WhitespaceAnalyzer / ShingleAnalyzer as native expression compositions
  * — identical semantics to the Scala analyzers (lower, split on \s+, drop
  * empties; n-grams of consecutive tokens joined by spaces) but codegen'd:
  * the tokenize pass dominates every corpus-scale text plan, and a Scala
  * UDF there breaks whole-stage codegen. The Analyzer classes remain the
  * source of truth for the registry/index path (where per-analyzer
  * configurability matters more than raw scan speed). */
object TextExprs {

  /** `WhitespaceAnalyzer(lowercase = true).tokens` as a Column. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** `ShingleAnalyzer(ws, n).tokens` as a Column: empty below n tokens. */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array())
  }
}
