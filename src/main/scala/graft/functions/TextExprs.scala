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

  /** `ShingleAnalyzer(ws, n).tokens` over a PRE-MATERIALIZED token array
    * column (the output of [[tokens]] projected as its own attribute):
    * empty below n tokens.
    *
    * The input MUST be an attribute, not the tokenize expression inline:
    * the `transform` lambda embeds its argument in the per-element body and
    * Catalyst's subexpression elimination does not reach into HOF lambdas,
    * so an inline `tokens(text)` argument re-tokenizes the whole document
    * once per shingle — O(tokens²) per doc (an 8× regression at sf0.1,
    * worse with doc length). Against an attribute the per-element cost is
    * one array `slice`, giving the linear plan. */
  def shinglesOf(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))
      .otherwise(array())

  /** `Analyzers.minHashSignature` over a shingle-array column, codegen'd
    * (`minhash_sig` native expression): at 100 TB the signature pass is
    * the single biggest dedup stage, and the former Scala UDF broke
    * whole-stage codegen exactly there (r16 VERDICT item 8). The kernel is
    * byte-identical to the UDF's (same murmur base hashes, same (a·x+b)
    * mod 2⁶¹−1 permutations) — DedupSpec pins UDF-vs-native parity. */
  def minhashOf(shingles: Column, numHashes: Int): Column =
    call_function("minhash_sig", shingles, lit(numHashes))
}
