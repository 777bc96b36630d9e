package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.analysis.AnalyzerRegistry

/** Distributed inverted index over a document DataFrame.
  *
  * Spark-native re-expression of the reference's IResearch index
  * (/root/reference/server/catalog/inverted_index.h;
  * /root/reference/libs/iresearch/include/iresearch/formats/): instead of
  * per-segment posting files, the index is three DataFrames, persisted as
  * parquet segments by [[IndexStore]]:
  *
  *   - postings:  (term, doc_id, tf, positions[, bucket])  — one row per
  *     (doc, term); on disk, directory-partitioned by `bucket = hash(term)`
  *     so single-term lookups prune to 1/64 of the files;
  *   - termDict:  (term, df, ctf[, bucket]) — document frequency + collection
  *     term frequency; powers ts_dict_* facets directly (SURVEY.md §2.4) and
  *     fuzzy/prefix/regex/range term expansion;
  *   - docStats:  (doc_id, dlen) + collection stats (numDocs, sumDl) —
  *     the BM25 length-normalization inputs
  *     (/root/reference/libs/iresearch/include/iresearch/search/bm25.hpp).
  *
  * Scale notes: postings are built with one explode + one groupBy shuffle,
  * both keyed on (doc, term) so map-side partial aggregation applies; the
  * only global state is the (tiny) term dictionary and two scalars. Every
  * search primitive below is a join/semi-join — no `collect()` — so plans
  * compose and stay distributed. Scoring drives from the matched postings
  * (bucket-pruned union), never from a full corpus scan — the Spark shape of
  * the reference's WAND postings walk (max_score_iterator.hpp): cost is
  * O(Σ df(term)), not O(numDocs).
  */
final case class InvertedIndex(
    postings: DataFrame,
    termDict: DataFrame,
    docStats: DataFrame,
    numDocs: Long,
    sumDl: Long) {

  /** Exact collection average doc length; derived so segment merges stay
    * lossless (sumDl adds, avgDl wouldn't). */
  def avgDl: Double = if (numDocs == 0) 0.0 else sumDl.toDouble / numDocs

  private val hasBucket = postings.columns.contains("bucket")
  private val dictHasBucket = termDict.columns.contains("bucket")

  /** Postings rows for one exact term, pruned to its hash bucket when the
    * index was loaded from bucket-partitioned parquet (1/64 of the files). */
  def postingsFor(t: String): DataFrame = {
    val base = if (hasBucket) postings.filter(col("bucket") === IndexStore.bucketOf(t))
               else postings
    base.filter(col("term") === t)
  }

  private def postingsForAny(terms: Seq[String]): DataFrame = {
    val base = if (hasBucket)
      postings.filter(col("bucket").isin(terms.map(IndexStore.bucketOf).distinct: _*))
    else postings
    base.filter(col("term").isin(terms: _*))
  }

  /** Term-dictionary rows for exact terms, bucket-pruned like postings. */
  def termDictFor(terms: Seq[String]): DataFrame = {
    val base = if (dictHasBucket)
      termDict.filter(col("bucket").isin(terms.map(IndexStore.bucketOf).distinct: _*))
    else termDict
    base.filter(col("term").isin(terms: _*))
  }

  /** Doc ids containing `term`. */
  def term(t: String): DataFrame = postingsFor(t).select(col("doc_id"))

  /** Docs matching at least `minMatch` of `terms` (ts_any, search.h:94-98). */
  def anyOf(terms: Seq[String], minMatch: Int = 1): DataFrame =
    postingsForAny(terms)
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
      .select(col("doc_id"))

  /** Docs containing every term (ts_all). */
  def allOf(terms: Seq[String]): DataFrame = anyOf(terms.distinct, terms.distinct.size)

  /** Term-dictionary expansion primitives: prefix / wildcard / regex / fuzzy /
    * range run over the (small) term dictionary, then join postings —
    * mirroring the reference's automaton-over-term-dict filters
    * (prefix_filter.hpp, wildcard_filter.hpp, automaton_filter.hpp,
    * levenshtein_filter.hpp, granular_range_filter.hpp). */
  def expandTerms(pred: Column): DataFrame = termDict.filter(pred).select(col("term"))

  private def docsForTerms(terms: DataFrame): DataFrame =
    postings.join(broadcast(terms), "term").select(col("doc_id")).distinct()

  /** Prefix match rewritten as a term RANGE (`term >= p AND term < p⁺`, with
    * p⁺ = p with its last char incremented) — byte-order-equivalent to
    * startsWith but pushed to parquet as min/max range filters, so term-dict
    * row groups outside the prefix band never decompress (the reference walks
    * a term-dict range the same way, prefix_filter.hpp). The residual
    * startsWith keeps semantics exact even if p⁺ overflows. */
  def prefix(p: String): DataFrame = docsForTerms(expandTerms(prefixPred(p)))

  /** Docs whose term starts with ANY of `prefixes` — one term-dict scan,
    * then one bucket-pruned postings join. Drives mixed-precision geo cell
    * coverings (a coarse covering cell is a prefix of every finer cell
    * inside it), where N separate [[prefix]] calls would mean N dict scans
    * and an N-way union.
    *
    * Small prefix sets become an OR of pushable term ranges; large ones
    * (fine-boundary coverings run to hundreds of cells) use ONE pushable
    * global range plus per-length set membership — `isin` over >10 values
    * optimizes to an O(1) hash-set probe (InSet), where an equally long
    * OR-of-ranges chain would blow up codegen. */
  def anyOfPrefixes(prefixes: Seq[String]): DataFrame = {
    require(prefixes.nonEmpty, "anyOfPrefixes needs at least one prefix")
    // prefix-free reduction: drop any prefix that has an ancestor in the set
    // (the ancestor matches a superset, so the matched terms are unchanged).
    // The >16 path's single global upper bound is exact ONLY for prefix-free
    // sets (round-7 ADVICE: with both 'b' and 'ba' present, ps.max = 'ba'
    // would bound out terms like 'bz' that 'b' should match). In sorted
    // order an element's longest kept ancestor is always acc.last — any
    // kept element between an ancestor and its descendant would itself
    // start with that ancestor and have been dropped.
    val ps = prefixes.distinct.sorted
      .foldLeft(Vector.empty[String]) { (acc, p) =>
        if (acc.nonEmpty && p.startsWith(acc.last)) acc else acc :+ p
      }
    val pred =
      if (ps.size <= 16) ps.map(prefixPred).reduce(_ || _)
      else {
        val lo = ps.min
        val hiBase = ps.max
        val range =
          if (hiBase.last >= Char.MaxValue ||
              Character.isSurrogate((hiBase.last + 1).toChar))
            col("term") >= lo
          else col("term") >= lo && col("term") < hiBase.init + (hiBase.last + 1).toChar
        // a term shorter than a level's length substrings to a shorter
        // string, which is never in that level's set — exactness holds
        val member = ps.groupBy(_.length).toSeq.sortBy(_._1)
          .map { case (l, cells) => substring(col("term"), 1, l).isin(cells: _*) }
          .reduce(_ || _)
        range && member
      }
    docsForTerms(expandTerms(pred))
  }

  private def prefixPred(p: String): Column = {
    val base = col("term").startsWith(p)
    // p.last + 1 landing in the surrogate range would make the upper-bound
    // literal encode as '?' (lone surrogates aren't valid UTF-8), turning
    // the range empty — fall back to the bare startsWith there
    if (p.isEmpty || p.last >= Char.MaxValue ||
        Character.isSurrogate((p.last + 1).toChar)) base
    else {
      val upper = p.init + (p.last + 1).toChar
      col("term") >= p && col("term") < upper && base
    }
  }

  /** SQL LIKE-style wildcard over terms (%, _) — ts_like. A literal prefix
    * before the first wildcard char becomes a pushable term range, same as
    * [[prefix]]. */
  def wildcard(pattern: String): DataFrame = docsForTerms(wildcardTerms(pattern))

  /** Regex over terms — ts_regexp. */
  def regexp(pattern: String): DataFrame = docsForTerms(regexpTerms(pattern))

  /** Dictionary expansions of the multi-term leaves as `(term)` frames —
    * the scored MultiTermQuery form feeds [[bm25OverTerms]]; the boolean
    * match form wraps them in [[docsForTerms]]. */
  def prefixTerms(p: String): DataFrame = expandTerms(prefixPred(p))

  def wildcardTerms(pattern: String): DataFrame = {
    val litPrefix = pattern.takeWhile(c => c != '%' && c != '_' && c != '\\')
    val pred = col("term").like(pattern)
    expandTerms(if (litPrefix.isEmpty) pred else prefixPred(litPrefix) && pred)
  }

  def regexpTerms(pattern: String): DataFrame =
    expandTerms(col("term").rlike(pattern))

  def rangeTerms(lo: Option[String], hi: Option[String],
      loInc: Boolean = true, hiInc: Boolean = true): DataFrame = {
    val lower = lo.map(v => if (loInc) col("term") >= v else col("term") > v)
    val upper = hi.map(v => if (hiInc) col("term") <= v else col("term") < v)
    expandTerms((lower ++ upper).reduceOption(_ && _).getOrElse(lit(true)))
  }

  /** Levenshtein fuzzy match — ts_levenshtein. `maxTerms` caps the
    * dictionary expansion to the CLOSEST terms (the reference's
    * `sdb_levenshtein_max_terms` session knob, default 64, 0 = uncapped —
    * levenshtein_max_terms.test): survivors are ranked by similarity
    * `1 - dist/max(len)`, exact match first, term as the deterministic
    * tie-break. The cap bounds the postings union a sloppy probe can fan
    * into on a 100 TB-scale dictionary. */
  def fuzzy(t: String, maxDist: Int, maxTerms: Int = -1,
      transpositions: Boolean = true, prefix: String = ""): DataFrame =
    docsForTerms(
      fuzzyTerms(t, maxDist, maxTerms, transpositions, prefix).select(col("term")))

  /** Fuzzy dictionary expansion as `(term, w)` with w = the reference's
    * similarity boost 1 − d/min(|term|,|target|)
    * (levenshtein_filter.cpp:49-54,119-124) — also the rank key for the
    * `maxTerms` cap (the reference's scored_terms_limit keeps the
    * highest-boost terms). */
  def fuzzyTerms(t: String, maxDist: Int, maxTerms: Int = -1,
      transpositions: Boolean = true, prefix: String = ""): DataFrame = {
    // the session knob (`SET spark.graft.levenshteinMaxTerms = N`) is the
    // reference's SET sdb_levenshtein_max_terms; an explicit arg overrides
    // read from the ACTIVE session, not termDict's: the loaded index is
    // cached across sessions, and the knob is per-connection (the sqllogic
    // runner SETs it on its own session clone)
    val cap =
      if (maxTerms >= 0) maxTerms
      else org.apache.spark.sql.SparkSession.active.conf
        .get("spark.graft.levenshteinMaxTerms", "64").toInt
    // an exact `prefix` (ts_levenshtein 4th arg) narrows the dict to a
    // PUSHED term range first; the distance runs over the remainder
    val base =
      if (prefix.isEmpty) termDict
      else termDict.filter(col("term").startsWith(prefix))
    val term =
      if (prefix.isEmpty) col("term")
      else col("term").substr(lit(prefix.length + 1), length(col("term")))
    // length band first: |len(term) - len(t)| <= maxDist is a necessary
    // condition for edit distance <= maxDist, is pushable/codegen-cheap, and
    // prunes the dict scan before any DP runs; the thresholded distance
    // kernel (Spark's 3-arg levenshtein, or the OSA expression when
    // transpositions are on — the reference DEFAULT, ts_common.hpp:242)
    // then early-exits rows that blow the band
    // Spark's length() counts CODE POINTS, so the target length must too
    // (t.length is UTF-16 units — a non-BMP char would skew the band and
    // the similarity boost; the reference uses UTF-8 code-point lengths on
    // both sides, levenshtein_filter.cpp Similarity)
    val tLen = t.codePointCount(0, t.length)
    val band = abs(length(term) - lit(tLen)) <= maxDist
    val dist =
      if (transpositions)
        graft.functions.TsDistances.osaDistance(term, lit(t), maxDist)
      else levenshtein(term, lit(t), maxDist)
    val expanded = base.filter(band && dist >= 0 && dist <= maxDist)
      .withColumn("w", lit(1.0) - dist.cast("double") /
        greatest(least(length(term), lit(tLen)), lit(1)).cast("double"))
    val capped =
      if (cap <= 0) expanded
      else expanded.orderBy(col("w").desc, col("term")).limit(cap)
    capped.select(col("term"), col("w"))
  }

  /** Term range — ts_between / ts_lt / ts_gt family. */
  def range(lo: Option[String], hi: Option[String],
      loInc: Boolean = true, hiInc: Boolean = true): DataFrame =
    docsForTerms(rangeTerms(lo, hi, loInc, hiInc))

  /** ts_ngram — n-gram similarity match (ts_ngram.cpp;
    * ngram_similarity_filter.hpp; demo3 §4): docs containing any term whose
    * character-n-gram Jaccard with `query` ≥ minJaccard. The Jaccard runs
    * over the (small) term dictionary as a codegen'd expression — the
    * typo-tolerant match class distinct from levenshtein. */
  def ngramSimilarity(query: String, minJaccard: Double, n: Int = 3): DataFrame = {
    val qGrams = (0 to query.length - n).map(i => query.substring(i, i + n)).distinct
    require(qGrams.nonEmpty, s"query shorter than $n")
    val qLit = qGrams.map(g => s"'${g.replace("'", "\\'")}'").mkString("array(", ", ", ")")
    val grams = s"""CASE WHEN length(term) < $n THEN CAST(array() AS ARRAY<STRING>)
      ELSE array_distinct(transform(sequence(1, length(term) - ${n - 1}),
        i -> substring(term, i, $n))) END"""
    val j = s"""CAST(size(array_intersect($grams, $qLit)) AS DOUBLE) /
      CAST(size(array_union($grams, $qLit)) AS DOUBLE)"""
    docsForTerms(expandTerms(expr(s"$j >= $minJaccard")))
  }

  /** ts_ngram over a GRAM-TOKENIZED field (TsQuery.GramSim; reference
    * ngram_match.test, ngram_similarity_query.cpp): the postings' terms ARE
    * grams, so matching is one bucket-pruned postings probe for the distinct
    * query grams followed by a per-doc longest-common-gram-SEQUENCE check —
    * never a dictionary scan, output-sensitive at any corpus size. A doc
    * matches when LCS(query gram sequence, doc's position-ordered matched
    * grams) ≥ MinMatchCount(|full query sequence|, minRatio) — duplicates
    * kept in the denominator and order respected, exactly the reference's
    * threshold arithmetic (ngram_similarity_filter.cpp:34). A query with no
    * grams matches nothing (the reference returns QueryBuilder::Empty),
    * same as the row-eval path — never an error. */
  def gramSimilarity(qGrams: Seq[String], minRatio: Double): DataFrame = {
    val gs = qGrams.distinct
    if (gs.isEmpty) return postings.select(col("doc_id")).filter(lit(false))
    val minMatch = graft.functions.TsDistances.minMatchCount(qGrams.size, minRatio)
    val qSeq = qGrams.toIndexedSeq
    val lcs = udf((doc: Seq[String]) =>
      graft.functions.TsDistances.lcsLen(qSeq, doc))
    // sort_array on (pos, term) structs orders by position; a NULL positions
    // array (index built without positions) explodes to zero rows, so such
    // fields match nothing — the reference's kRequiredFeatures gate
    // (ngram_similarity_filter.cpp:60-64) returns Empty there too.
    postingsForAny(gs)
      .select(col("doc_id"), explode(col("positions")).as("pos"), col("term"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, term))), x -> x.term)")
        .as("__seq"))
      .filter(lcs(col("__seq")) >= minMatch)
      .select(col("doc_id"))
  }

  /** Exact positional phrase via postings positions — ts_phrase with slop 0
    * (/root/reference/libs/iresearch/include/iresearch/search/phrase_filter.hpp).
    * Chains per-term postings joins on doc_id, intersecting shifted position
    * arrays; the i-th intersection holds positions where a length-i prefix of
    * the phrase ends. All joins are co-partitioned on doc_id after the first
    * shuffle; no driver-side state. */
  def phrase(terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty phrase")
    val first = postingsFor(terms.head)
      .select(col("doc_id"), col("positions").as("chain"))
    val chained = terms.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, _)) =>
      val next = postingsFor(t)
        .select(col("doc_id"), col("positions").as("next_pos"))
      acc.join(next, "doc_id")
        .withColumn("chain",
          array_intersect(transform(col("chain"), p => p + 1), col("next_pos")))
        .filter(size(col("chain")) > 0)
        .select(col("doc_id"), col("chain"))
    }
    chained.select(col("doc_id"))
  }

  /** Phrase whose final slot is a PREFIX match (ES match_phrase_prefix):
    * the last step of the position chain runs against the UNION of
    * positions of every prefix-expanded term, merged per doc with one
    * groupBy — distributed end to end, so unlike Lucene no max_expansions
    * cap is needed (the expansion never leaves the executors). `init`
    * empty degenerates to [[prefix]]. */
  def phrasePrefix(init: Seq[String], prefix: String): DataFrame = {
    if (init.isEmpty) return this.prefix(prefix)
    val lastPos = postings
      .join(broadcast(expandTerms(prefixPred(prefix))), "term")
      .groupBy(col("doc_id"))
      .agg(flatten(collect_list(col("positions"))).as("next_pos"))
    val first = postingsFor(init.head)
      .select(col("doc_id"), col("positions").as("chain"))
    val chained = init.drop(1).foldLeft(first) { (acc, t) =>
      val next = postingsFor(t)
        .select(col("doc_id"), col("positions").as("next_pos"))
      acc.join(next, "doc_id")
        .withColumn("chain",
          array_intersect(transform(col("chain"), p => p + 1), col("next_pos")))
        .filter(size(col("chain")) > 0)
        .select(col("doc_id"), col("chain"))
    }
    chained.join(lastPos, "doc_id")
      .withColumn("chain",
        array_intersect(transform(col("chain"), p => p + 1), col("next_pos")))
      .filter(size(col("chain")) > 0)
      .select(col("doc_id"))
  }

  /** Sloppy phrase — ts_phrase with per-gap [min,max] position ranges
    * (/root/reference/libs/iresearch/include/iresearch/search/slop_phrase.hpp).
    * `gaps(i)` bounds the position delta between term i and term i+1
    * (exact phrase = (1,1) everywhere). The chain carries candidate
    * end-positions; each step keeps positions of the next term within
    * [prev+min, prev+max]. */
  def sloppyPhrase(terms: Seq[String], gaps: Seq[(Int, Int)]): DataFrame = {
    require(terms.size >= 2 && gaps.size == terms.size - 1, "gaps must be terms-1")
    val first = postingsFor(terms.head)
      .select(col("doc_id"), col("positions").as("chain"))
    val chained = terms.drop(1).zip(gaps).foldLeft(first) { case (acc, (t, (lo, hi))) =>
      val next = postingsFor(t)
        .select(col("doc_id"), col("positions").as("next_pos"))
      acc.join(next, "doc_id")
        .withColumn("chain",
          filter(col("next_pos"), p =>
            exists(col("chain"), c => p >= c + lo && p <= c + hi)))
        .filter(size(col("chain")) > 0)
        .select(col("doc_id"), col("chain"))
    }
    chained.select(col("doc_id"))
  }

  /** Move-budget sloppy phrase (Lucene slop; reference
    * `ts_phrase(..., slop := N)`, sloppy_phrase.test /
    * iresearch search/phrase_filter.hpp's VariadicPhrase): matches when the
    * terms align with total displacement Σ|pᵢ₊₁ − pᵢ − 1| ≤ slop — one
    * inserted word costs 1, a transposed adjacent pair costs 2. Unlike
    * [[sloppyPhrase]]'s per-gap ranges, the budget is shared and order
    * inversions are admitted. Chained co-partitioned joins on doc_id like
    * [[phrase]]; the chain carries (endPos, minUsedBudget) structs — a DP
    * whose state is one struct per candidate position, all inside
    * higher-order functions (codegen'd, no UDF). */
  def slopPhrase(terms: Seq[String], slop: Int): DataFrame = {
    require(terms.size >= 2, "slop phrase needs >= 2 terms")
    val first = postingsFor(terms.head)
      .select(col("doc_id"), transform(col("positions"),
        p => struct(p.as("p"), lit(0).as("c"))).as("chain"))
    val chained = terms.drop(1).foldLeft(first) { (acc, t) =>
      val next = postingsFor(t)
        .select(col("doc_id"), col("positions").as("next_pos"))
      acc.join(next, "doc_id")
        .withColumn("chain",
          filter(
            transform(col("next_pos"), pp => struct(
              pp.as("p"),
              array_min(transform(
                filter(col("chain"), e => e.getField("p") =!= pp),
                e => e.getField("c") + abs(pp - e.getField("p") - lit(1)))).as("c"))),
            e => e.getField("c").isNotNull && e.getField("c") <= slop))
        .filter(size(col("chain")) > 0)
        .select(col("doc_id"), col("chain"))
    }
    chained.select(col("doc_id"))
  }

  /** Matched docs with per-query-term tf and df as pivoted columns
    * (`0_tf`, `0_df`, `1_tf`, …, indexed by position in `distinctTerms`),
    * joined with docStats for dlen. This is the shared scoring drive: only
    * docs matching ≥1 term are ever produced (union of bucket-pruned per-term
    * postings), so cost is O(Σ df(term)) — the reference's postings-walk
    * shape (top_k_heap.hpp, max_score_iterator.hpp), not a corpus scan. */
  private def matchedTermStats(distinctTerms: Seq[String],
      candidates: Option[DataFrame] = None): DataFrame = {
    val tIdx = typedlit(distinctTerms.zipWithIndex.toMap)
    val base = postingsForAny(distinctTerms)
    // WAND candidate prune: only docs that matched a NECESSARY term enter
    // the pivot/groupBy shuffle and the docStats join
    val pruned = candidates.fold(base)(c => base.join(c, Seq("doc_id"), "left_semi"))
    val matched = pruned
      .join(broadcast(termDictFor(distinctTerms)
        .select(col("term"), col("df"), col("ctf"))), "term")
      .withColumn("ti", element_at(tIdx, col("term")))
    matched.groupBy(col("doc_id"))
      .pivot("ti", distinctTerms.indices)
      .agg(first(col("tf")).as("tf"), first(col("df")).as("df"),
        first(col("ctf")).as("ctf"))
      .join(docStats.select(col("doc_id"), col("dlen")), "doc_id")
  }

  /** BM25 scores for a bag of query terms, one row per matching doc.
    *
    * Standard BM25 (k1=1.2, b=0.75, Lucene-style idf) — per-term partial
    * scores are separate pivoted columns added in query-term order, so the
    * double addition order is fixed and the score is reproducible
    * bit-for-bit (a groupBy sum would add in shuffle arrival order).
    */
  def bm25(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(terms, k1, b, None)

  private def bm25Scored(terms: Seq[String], k1: Double, b: Double,
      candidates: Option[DataFrame]): DataFrame = {
    val distinct = terms.distinct
    val scored = matchedTermStats(distinct, candidates)
    val scoreCols = terms.map { t =>
      val i = distinct.indexOf(t)
      val tf = coalesce(col(s"${i}_tf").cast("double"), lit(0.0))
      val dfT = coalesce(col(s"${i}_df").cast("double"), lit(1.0))
      val idf = log(lit(1.0) + (lit(numDocs.toDouble) - dfT + 0.5) / (dfT + 0.5))
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dlen").cast("double") / avgDl))
    }
    scored
      .withColumn("_score", scoreCols.reduce(_ + _))
      .filter(col("_score") > 0.0)
      .select(col("doc_id"), col("_score"))
  }

  /** BM25 over a DATA-DEPENDENT dictionary expansion — the reference's
    * scored MultiTermQuery (multiterm_query.cpp:157-200): a doc matched by
    * several expanded terms scores merge(w(term) × bm25-contribution(term)).
    * Merge is Sum for prefix/range/wildcard/regexp (prefix_filter.cpp:77,
    * range_filter.cpp:121, automaton_utils.cpp:227-228) and Max for fuzzy
    * (levenshtein_filter.cpp:163-165), whose `w` carries the similarity
    * boost from [[fuzzyTerms]]; other expansions default w = 1.
    *
    * Float determinism: the Sum merge collects each doc's (term,
    * contribution) pairs, sorts by term, and folds in that fixed order — a
    * plain groupBy sum would add doubles in shuffle arrival order. The
    * per-doc pair count is bounded by the expansion size (itself capped for
    * fuzzy), so the collected arrays stay small. The expansion is
    * dict-filtered and broadcast; postings are touched once. */
  def bm25OverTerms(expansion: DataFrame, mergeMax: Boolean = false,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreOverTerms(expansion, "bm25", mergeMax, Seq(k1, b))

  /** [[bm25OverTerms]] generalized by scorer kernel — the reference scores
    * ANY scorer over a multi-term expansion (TfIdfScore folds the same
    * per-term boost, tfidf.cpp:89-95). bm25 and tfidf (the two the
    * reference's index corpus pins with exact goldens) are supported;
    * the collection-stats scorers (lm_*, indri, dfi) raise. */
  def scoreOverTerms(expansion: DataFrame, scorer: String,
      mergeMax: Boolean = false, params: Seq[Any] = Nil): DataFrame = {
    def num(i: Int, d: Double): Double = params.lift(i) match {
      case Some(n: Number) => n.doubleValue
      case Some(other) => throw new IllegalArgumentException(
        s"$scorer: parameter ${i + 1} must be numeric, got $other")
      case None => d
    }
    val withW =
      if (expansion.columns.contains("w")) expansion.select(col("term"), col("w"))
      else expansion.select(col("term"), lit(1.0).as("w"))
    val terms = withW.join(termDict.select(col("term"), col("df")), "term")
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val contrib = scorer match {
      case "bm25" =>
        val k1 = num(0, 1.2); val b = num(1, 0.75)
        val idf = log(lit(1.0) + (lit(numDocs.toDouble) - dfD + 0.5) / (dfD + 0.5))
        idf * tfD * (k1 + 1.0) /
          (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dlen").cast("double") / avgDl)) *
          col("w")
      case "tfidf" =>
        val base = sqrt(tfD) *
          log(lit(1.0) + (lit(numDocs.toDouble) + 1.0) / (dfD + 1.0)) * col("w")
        if (params.headOption.contains(true))
          base / sqrt(col("dlen").cast("double"))
        else base
      case other => throw new IllegalArgumentException(
        s"scorer $other does not support multi-term expansion scoring")
    }
    val matched = postings.join(broadcast(terms), "term")
      .join(docStats.select(col("doc_id"), col("dlen")), "doc_id")
      .select(col("doc_id"), col("term"), contrib.as("__c"))
    val merged =
      if (mergeMax) matched.groupBy(col("doc_id")).agg(max(col("__c")).as("_score"))
      else matched.groupBy(col("doc_id"))
        .agg(aggregate(array_sort(collect_list(struct(col("term"), col("__c")))),
          lit(0.0), (acc, x) => acc + x.getField("__c")).as("_score"))
    // The Max merge is the fuzzy path, whose similarity boost can be
    // EXACTLY 0 (distance == min code-point length): the reference keeps
    // matched docs at score 0 (levenshtein_filter.cpp Max merge), so only
    // the Sum paths — where a match mathematically implies a positive
    // bm25/tfidf contribution — drop the zero guard rows.
    val out = merged.select(col("doc_id"), col("_score"))
    if (mergeMax) out else out.filter(col("_score") > 0.0)
  }

  /** Scorer-name dispatch over the per-scorer term-bag kernels — one place
    * for the reference's 9 registered scorers (search.cpp:142-173), used by
    * both the SQL claim rules and the structured-query scoring tree. */
  def scoredTerms(scorer: String, terms: Seq[String],
      params: Seq[Any] = Nil): DataFrame = {
    def num(i: Int, d: Double): Double = params.lift(i) match {
      case Some(n: Number) => n.doubleValue
      case Some(other) => throw new IllegalArgumentException(
        s"$scorer: parameter ${i + 1} must be numeric, got $other")
      case None => d
    }
    scorer match {
      case "bm25" => bm25(terms, k1 = num(0, 1.2), b = num(1, 0.75))
      case "tfidf" => tfidf(terms, withNorms = params.headOption.exists {
        case b: Boolean => b
        case other => throw new IllegalArgumentException(
          s"tfidf: with_norms must be boolean, got $other")
      })
      case "lm_dirichlet" => lmDirichlet(terms, mu = num(0, 2000.0))
      case "lm_jelinek_mercer" | "lm_jm" =>
        lmJelinekMercer(terms, lambda = num(0, 0.1))
      case "indri_dirichlet" => indriDirichlet(terms, mu = num(0, 2000.0))
      case "dfi" => dfi(terms, measure = params.headOption match {
        case Some(s: String) => s
        case Some(other) => throw new IllegalArgumentException(
          s"dfi: measure must be a string, got $other")
        case None => "standardized"
      })
      case "raw_tf" => rawTf(terms)
      case "raw_dl" => rawDl(terms)
      case "raw_boost" => rawBoost(terms)
      case other => throw new IllegalArgumentException(s"unknown scorer $other")
    }
  }

  /** TFIDF scores — the reference's second scorer
    * (/root/reference/libs/iresearch/include/iresearch/search/tfidf.hpp,
    * registered at server/connector/functions/search.cpp:142-173):
    * score = Σ sqrt(tf) * idf² with idf = 1 + ln(numDocs / (df + 1)),
    * norm-free (the reference's default). Shares the matched-postings drive
    * with bm25. */
  def tfidf(terms: Seq[String], withNorms: Boolean = false): DataFrame = {
    val distinct = terms.distinct
    val scored = matchedTermStats(distinct)
    val scoreCols = terms.map { t =>
      val i = distinct.indexOf(t)
      val tf = coalesce(col(s"${i}_tf").cast("double"), lit(0.0))
      val dfT = coalesce(col(s"${i}_df").cast("double"), lit(1.0))
      // the reference's idf (tfidf.cpp:148-151): log1p((N+1)/(df+1)) —
      // NOT Lucene-classic (1+ln(N/(df+1)))² (fixed r14 against the exact
      // goldens of inverted_index_multiterm_score.test: ln5/ln3 on the
      // 7-doc corpus). with_norms (the optional BOOLEAN scorer arg,
      // search.cpp:151; off by default, tfidf.hpp:38) divides each
      // contribution by sqrt(norm) = sqrt(dlen) (tfidf.cpp:73-76).
      val idf = log(lit(1.0) + (lit(numDocs.toDouble) + 1.0) / (dfT + 1.0))
      val base = sqrt(tf) * idf
      if (withNorms) base / sqrt(col("dlen").cast("double")) else base
    }
    scored
      .withColumn("_score", scoreCols.reduce(_ + _))
      .filter(col("_score") > 0.0)
      .select(col("doc_id"), col("_score"))
  }

  /** LM-Dirichlet query likelihood — the reference's lm_dirichlet scorer
    * (libs/iresearch/.../search/lm_dirichlet.hpp; search.cpp:142-173):
    * score = Σ_t log(1 + tf / (μ · p_c(t))) + |q| · log(μ / (dlen + μ)),
    * with p_c(t) = ctf / sumDl the collection language model. Matched docs
    * only; a doc matching none of the terms scores nothing (the reference
    * also scores only index matches). */
  def lmDirichlet(terms: Seq[String], mu: Double = 2000.0): DataFrame = {
    require(mu >= 0.0 && !mu.isInfinite && !mu.isNaN,
      "lm_dirichlet: mu must be a non-negative finite value")
    val distinct = terms.distinct
    val scored = matchedTermStats(distinct)
    val sumDlD = sumDl.toDouble
    val termScores = terms.map { t =>
      val i = distinct.indexOf(t)
      val tf = coalesce(col(s"${i}_tf").cast("double"), lit(0.0))
      val ctfT = coalesce(col(s"${i}_ctf").cast("double"), lit(1.0))
      // per-term score floors at ZERO (lm_dirichlet.cpp:57-68: r =
      // log1p(tf·mu_p_inv) − log1p(dl/mu), clamped) — an unmatched term
      // (tf=0) contributes exactly 0, and a long doc can never drive a
      // matched term's contribution negative
      greatest(
        log(lit(1.0) + tf / (lit(mu) * (ctfT / sumDlD))) +
          log(lit(mu) / (col("dlen").cast("double") + mu)),
        lit(0.0))
    }
    scored
      .withColumn("_score", termScores.reduce(_ + _))
      .select(col("doc_id"), col("_score"))
  }

  /** LM-Jelinek-Mercer smoothing (lm_jelinek_mercer.hpp:33-46):
    * score = Σ_t log(1 + ((1-λ)·tf/dlen) / (λ·p_c(t))); the default λ is
    * the reference's LAMBDA() = 0.1, λ ∈ (0, 1]. */
  def lmJelinekMercer(terms: Seq[String], lambda: Double = 0.1): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0,
      "lm_jelinek_mercer: lambda must be in (0, 1]")
    val distinct = terms.distinct
    val scored = matchedTermStats(distinct)
    val sumDlD = sumDl.toDouble
    val termScores = terms.map { t =>
      val i = distinct.indexOf(t)
      val tf = coalesce(col(s"${i}_tf").cast("double"), lit(0.0))
      val ctfT = coalesce(col(s"${i}_ctf").cast("double"), lit(1.0))
      log(lit(1.0) +
        (lit(1.0 - lambda) * tf / col("dlen").cast("double")) /
          (lit(lambda) * (ctfT / sumDlD)))
    }
    scored
      .withColumn("_score", termScores.reduce(_ + _))
      .filter(col("_score") > 0.0)
      .select(col("doc_id"), col("_score"))
  }

  /** Indri-style Dirichlet query likelihood (indri_dirichlet.hpp):
    * score = Σ_t log((tf + μ·p_c(t)) / (dlen + μ)) over matched docs —
    * unlike lmDirichlet's rank-equivalent form, every query term contributes
    * its smoothed probability even at tf=0. */
  def indriDirichlet(terms: Seq[String], mu: Double = 2000.0): DataFrame = {
    require(mu >= 0.0 && !mu.isInfinite && !mu.isNaN,
      "indri_dirichlet: mu must be a non-negative finite value")
    val distinct = terms.distinct
    // Indri smoothing needs each term's GLOBAL ctf even for docs where the
    // term is absent (tf=0 still contributes log(μ·p_c/(dlen+μ))) — the
    // pivoted per-doc ctf is null there, so carry a broadcast one-row
    // global-stats plan instead.
    val globals = termDictFor(distinct).agg(
      max(when(col("term") === distinct.head, col("ctf"))).as("g0_ctf"),
      distinct.indices.drop(1).map(i =>
        max(when(col("term") === distinct(i), col("ctf"))).as(s"g${i}_ctf")): _*)
    val scored = matchedTermStats(distinct).crossJoin(broadcast(globals))
    val sumDlD = sumDl.toDouble
    val termScores = terms.map { t =>
      val i = distinct.indexOf(t)
      val tf = coalesce(col(s"${i}_tf").cast("double"), lit(0.0))
      val ctfT = coalesce(col(s"g${i}_ctf").cast("double"), lit(1.0))
      log((tf + lit(mu) * (ctfT / sumDlD)) / (col("dlen").cast("double") + mu))
    }
    scored.withColumn("_score", termScores.reduce(_ + _))
      .select(col("doc_id"), col("_score"))
  }

  /** DFI — divergence from independence (dfi.hpp): per term, expected tf
    * under independence e = dlen · ctf / sumDl; contribution
    * max(log2((tf+1)/(e+1)), 0) — only above-expectation terms score. */
  /** DFI — Divergence From Independence (dfi.hpp:30-49):
    * expected = dl · (ttf_t + 1)/(ttf_field + 1); score = 0 when
    * tf ≤ expected, else log2(measure(tf, expected) + 1) with the
    * reference's three independence measures (`standardized` default,
    * `saturated`, `chi_squared`). */
  def dfi(terms: Seq[String], measure: String = "standardized"): DataFrame = {
    val distinct = terms.distinct
    val scored = matchedTermStats(distinct)
    val sumDlD = sumDl.toDouble
    val termScores = terms.map { t =>
      val i = distinct.indexOf(t)
      val tf = coalesce(col(s"${i}_tf").cast("double"), lit(0.0))
      val ctfT = coalesce(col(s"${i}_ctf").cast("double"), lit(0.0))
      val e = col("dlen").cast("double") * ((ctfT + 1.0) / (sumDlD + 1.0))
      val m = measure match {
        case "standardized" => (tf - e) / sqrt(e)
        case "saturated"    => (tf - e) / e
        case "chi_squared"  => (tf - e) * (tf - e) / e
        case other => throw new IllegalArgumentException(s"dfi: invalid measure $other")
      }
      when(tf > e, log2(m + 1.0)).otherwise(lit(0.0))
    }
    scored.withColumn("_score", termScores.reduce(_ + _))
      .filter(col("_score") > 0.0)
      .select(col("doc_id"), col("_score"))
  }

  /** raw_boost — constant score per matched doc (raw_boost.hpp). */
  def rawBoost(terms: Seq[String], boost: Double = 1.0): DataFrame =
    matchedTermStats(terms.distinct)
      .select(col("doc_id"), lit(boost).as("_score"))

  /** raw_tf / raw_dl — the reference's diagnostic scorers (search.cpp:142-173). */
  def rawTf(terms: Seq[String]): DataFrame = {
    val distinct = terms.distinct
    val scored = matchedTermStats(distinct)
    val tfs = terms.map { t =>
      coalesce(col(s"${distinct.indexOf(t)}_tf").cast("double"), lit(0.0))
    }
    scored.withColumn("_score", tfs.reduce(_ + _))
      .select(col("doc_id"), col("_score"))
  }

  def rawDl(terms: Seq[String]): DataFrame =
    matchedTermStats(terms.distinct)
      .select(col("doc_id"), col("dlen").cast("double").as("_score"))

  /** BM25 top-k with score pushdown: per-partition top-k heaps before the
    * global merge, the Spark shape of the reference's WAND collector
    * (/root/reference/server/connector/duckdb_table_function.h:176-194,
    * top_k_heap.hpp). `orderBy.limit` alone already plans TakeOrderedAndProject
    * (partial top-k per partition, O(k) driver merge — no global sort). */
  def bm25TopK(terms: Seq[String], k: Int): DataFrame =
    bm25(terms)
      .orderBy(col("_score").desc, col("doc_id"))
      .limit(k)

  /** BM25 with a minimum-score floor — the reference's `min_score` WAND
    * threshold claim (duckdb_table_function.h:176-182; max_score_iterator.hpp):
    * the floor seeds the drive instead of post-filtering.
    *
    * Two-level WAND, batch-shaped: per-term score UPPER BOUNDS come from the
    * term dictionary (idf × the tf-saturation ceiling at max_tf with the
    * dl→0 length bound — |q| doubles to the driver, metadata not data).
    * Sorting terms by bound, the NECESSARY set N is the smallest prefix such
    * that the remaining terms' bounds sum below the floor: a doc matching no
    * term of N can never reach it. Candidates therefore drive from N's
    * postings only, and the pivot + docStats join score just those docs —
    * the non-necessary terms' postings are touched only semi-joined against
    * the (floor-pruned) candidate set. Exactness: the final filter is the
    * same `_score >= minScore` over fully-scored docs; bounds only ever
    * EXCLUDE docs that provably cannot pass (IndexSpec asserts equality with
    * the post-filter plan and that candidates < matched docs). */
  def bm25MinScore(terms: Seq[String], minScore: Double,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (byUb, p) = wandNecessary(terms, minScore, k1, b)
    if (p == 0) bm25Scored(terms, k1, b, None).filter(lit(false)) // floor unreachable
    else if (p == byUb.size) bm25Scored(terms, k1, b, None).filter(col("_score") >= minScore)
    else {
      val candidates = anyOf(byUb.take(p))
      bm25Scored(terms, k1, b, Some(candidates)).filter(col("_score") >= minScore)
    }
  }

  /** Terms sorted by score upper bound (desc) and the necessary-prefix size
    * for `minScore` — exposed so tests can assert the floor prunes the
    * drive. The dictionary read is ≤ |query terms| rows: metadata, not
    * data. */
  private[index] def wandNecessary(terms: Seq[String], minScore: Double,
      k1: Double, b: Double): (Seq[String], Int) = {
    val distinct = terms.distinct
    val mult = terms.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ub = termDictFor(distinct)
      .select(col("term"), col("df").cast("double"), col("max_tf").cast("double"))
      .collect().map { r =>
        val (t, dfT, maxTf) = (r.getString(0), r.getDouble(1), r.getDouble(2))
        val idf = math.log(1.0 + (numDocs.toDouble - dfT + 0.5) / (dfT + 0.5))
        t -> mult(t) * idf * maxTf * (k1 + 1.0) / (maxTf + k1 * (1.0 - b))
      }.toMap
    val byUb = distinct.sortBy(t => -ub.getOrElse(t, 0.0))
    def tailSum(p: Int) = byUb.drop(p).map(ub.getOrElse(_, 0.0)).sum
    (byUb, (0 to byUb.size).find(tailSum(_) < minScore).getOrElse(byUb.size))
  }
}

object InvertedIndex {
  /** Build the index in ONE analyzer pass: analyze → posexplode →
    * groupBy(doc, term) → postings; termDict and docStats both derive from
    * postings (dlen = Σ tf), so the tokenizer UDF runs exactly once —
    * postings are persisted (memory-and-disk) until [[IndexStore.writeSegment]]
    * unpersists them after the durable write. `positions` are kept only when
    * `withPositions` (phrase support) — the reference's per-field `position`
    * feature toggle (/root/reference/server/pg/tokenizer_options.h:243-245).
    *
    * numDocs counts ALL docs (parquet metadata count — zero-token docs are
    * part of the collection for avgdl, matching the reference's per-segment
    * doc count); docStats carries only docs with ≥1 token, which is the set
    * that can ever match a query.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      analyzerName: String = "whitespace",
      withPositions: Boolean = true): InvertedIndex = {
    val analyzer = AnalyzerRegistry.get(analyzerName)
    val tokenize = udf((s: String) => analyzer.tokens(s))

    val exploded = docs
      .select(col(idCol).as("doc_id"), posexplode(tokenize(col(textCol))).as(Seq("pos", "term")))

    val postings = {
      val base = exploded.groupBy(col("term"), col("doc_id"))
      if (withPositions)
        base.agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))
      else
        base.agg(count(lit(1)).as("tf")).withColumn("positions", lit(null).cast("array<int>"))
    }.persist(StorageLevel.MEMORY_AND_DISK)

    val termDict = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ctf"),
        max(col("tf")).as("max_tf")) // per-term tf ceiling → WAND upper bounds

    val docStats = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("int").as("dlen"))

    val numDocs = docs.count() // parquet metadata count — no tokenize
    val stats = docStats.agg(sum(col("dlen").cast("long"))).head()
    val sumDl = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    InvertedIndex(postings, termDict, docStats, numDocs, sumDl)
  }
}
