package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.analysis.Analyzers
import graft.index.IndexStore
import graft.search.{TsQuery, TsQueryExec}

/** Result presentation (ts_offsets / ts_highlight — reference
  * ts_offsets.cpp 403 LoC, ts_highlight.cpp 734 LoC, demo3 §6) and the
  * text-analysis operators a training-data pipeline needs: token stats,
  * quality scoring, language ID, document fingerprinting. All entries are
  * DuckDB-oracle-checked; the heuristics are defined so the oracle can
  * recompute them exactly (md5 hashes, explicit stopword profiles).
  */
object TextPipeline {

  // codegen'd whitespace tokenization (TextExprs mirrors the analyzer)
  private def tok(c: org.apache.spark.sql.Column) = graft.functions.TextExprs.tokens(c)

  /** ts_offsets: char ranges of matches. The index prunes to matching docs
    * (semi-join on doc ids); a re-analysis UDF recovers offsets for those
    * docs only — the reference's in-memory re-analysis fallback
    * (highlight/memory_index.h:35-44). 1-based [start, end) offsets. */
  def tsOffsets(s: SparkSession, dir: String): DataFrame = {
    val matched = TsQueryExec.matching(
      IndexStore.documents(s, dir, "whitespace"), TsQuery.Term("vector"))
    val offs = udf((t: String) =>
      Analyzers.tokenOffsets(t).filter(_._1 == "vector").map(o => (o._2, o._3)))
    Tables.documents(s, dir)
      .join(matched, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(offs(col("text"))).as("o"))
      .select(col("doc_id"),
        col("o._1").cast("bigint").as("off_start"),
        col("o._2").cast("bigint").as("off_end"))
  }

  /** ts_positions: match TOKEN positions straight from postings — the
    * index-resident presentation path (the reference reads positions from
    * the inverted index when stored, iresearch_plan.cpp:652-752 claiming
    * ts_offsets; our index stores token positions, so this path touches no
    * document text at all — zero text IO, pure index read). Char-range
    * offsets (ts_offsets below) still use the documented prune+re-analyze
    * fallback, since storing char offsets would double the postings. */
  def tsPositions(s: SparkSession, dir: String): DataFrame =
    IndexStore.documents(s, dir, "whitespace")
      .postingsFor("vector")
      .select(col("doc_id"), explode(col("positions")).as("p"))
      .select(col("doc_id"), col("p").cast("bigint").as("pos"))

  /** ts_highlight: normalized-whitespace snippet with matched terms wrapped —
    * token-stream reconstruction so the snippet is engine-reproducible. */
  def tsHighlight(s: SparkSession, dir: String): DataFrame = {
    val matched = TsQueryExec.matching(
      IndexStore.documents(s, dir, "whitespace"), TsQuery.Term("vector"))
    Tables.documents(s, dir)
      .join(matched, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .select(col("doc_id"),
        concat_ws(" ", expr(
          "transform(ts, t -> CASE WHEN t = 'vector' THEN concat('<b>', t, '</b>') ELSE t END)"))
          .as("snippet"))
  }

  /** Token counting: total + distinct per doc. */
  def taTokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .select(col("doc_id"),
        size(col("ts")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("ts"))).cast("bigint").as("n_uniq"))

  /** GPT-2-style pretokenizer classes, restricted to syntax both Java regex
    * (Spark) and RE2 (DuckDB) implement identically: contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. (The
    * original's `\s+(?!\S)` lookahead is RE2-unsupported, so whitespace
    * tokens are intentionally not counted.) */
  private val bpeIshPattern =
    "'(s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** Token counting, BPE-ish: the byte-pair-pretokenizer regex class count
    * that LLM data pipelines budget with — alongside the whitespace count
    * for calibration. */
  def taBpeTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(bpeIshPattern), lit(0)))
          .cast("bigint").as("n_bpe"),
        size(tok(col("text"))).cast("bigint").as("n_ws"))

  private val stopwordsSql =
    Analyzers.EnglishStopwords.toSeq.sorted.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** Quality signals (length, uniqueness, stopword density, mean token
    * length) quantized to 1e-4 — the classic pretraining-corpus filters. */
  def taQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .select(col("doc_id"),
        size(col("ts")).cast("bigint").as("n_tokens"),
        round(size(array_distinct(col("ts"))).cast("double") /
          size(col("ts")).cast("double") * 10000).cast("bigint").as("uniq_ratio_q"),
        round(expr(s"size(filter(ts, t -> array_contains($stopwordsSql, t)))").cast("double") /
          size(col("ts")).cast("double") * 10000).cast("bigint").as("stop_ratio_q"),
        round(expr("aggregate(ts, 0L, (a, t) -> a + length(t))").cast("double") /
          size(col("ts")).cast("double") * 10000).cast("bigint").as("mean_len_q"))

  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich"),
    "fr" -> Seq("le", "et", "les", "des", "un", "une", "est", "que", "dans"),
    "es" -> Seq("el", "de", "que", "los", "en", "un", "una", "es", "por"))

  /** Language ID by stopword-profile hit counting (argmax, first-wins ties,
    * 'und' when nothing hits) — the n-gram-heuristic class of langid, defined
    * exactly so the oracle reproduces it. */
  def taLangId(s: SparkSession, dir: String): DataFrame = {
    val hits = langProfiles.map { case (lang, prof) =>
      val lst = prof.map(w => s"'$w'").mkString("array(", ", ", ")")
      expr(s"size(filter(ts, t -> array_contains($lst, t)))").as(s"h_$lang")
    }
    val Seq(en, de, fr, es) = langProfiles.map(p => col(s"h_${p._1}"))
    Tables.documents(s, dir)
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .select(col("doc_id") +: hits: _*)
      .select(col("doc_id"),
        when(en + de + fr + es === 0, "und")
          .when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es").as("lang_pred"))
  }

  /** Document fingerprint: minimum md5 over 5-token shingles — the
    * winnowing/MinHash-of-shingles primitive (one stable representative
    * k-gram per doc), md5 so any engine recomputes it. */
  def taFingerprint(s: SparkSession, dir: String): DataFrame = {
    // One shuffle-free pass: tokens materialized once (attribute, so the
    // shingle lambda is linear — see TextExprs.shinglesOf), the min-hash
    // reduced per row with array_min instead of explode + groupBy, and md5
    // fused into the shingle lambda so the shingle-string array is never
    // materialized. Docs shorter than the shingle width keep their row with
    // a NULL fingerprint — a row-dropping filter on size(ts) would be
    // pushed below the projection by alias substitution and tokenize every
    // document twice.
    Tables.documents(s, dir)
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .select(col("doc_id"),
        when(size(col("ts")) >= 5,
          array_min(transform(sequence(lit(0), size(col("ts")) - 5),
            i => md5(concat_ws(" ", slice(col("ts"), i + lit(1), lit(5))))))).as("fp"))
  }

  /** Repetition signals (the Gopher-style repetition filters): most-frequent
    * token share, most-frequent bigram share, duplicate-bigram fraction.
    *
    * Shuffle-FREE: per-doc mode counts come from a sorted-array run scan —
    * `array_sort` then one linear `aggregate` pass tracking (prev, run,
    * best) — so the whole entry is a projection over the documents scan; no
    * explode, no groupBy, nothing moves between executors. (The naive HOF
    * alternative `transform(distinct, t -> count_in(ts, t))` is O(tokens²)
    * per doc — the r4 shingle-regression shape; the explode+agg alternative
    * is linear but costs two shuffles and a join.) Distinct-bigram counts
    * fall out of the same sorted scan as run *starts*. Quantized 1e-4. */
  def taRepetition(s: SparkSession, dir: String): DataFrame = {
    def q(c: org.apache.spark.sql.Column) = round(c * 10000).cast("bigint")
    // longest equal-run length in a pre-sorted string array
    def bestRun(sorted: String) =
      s"""aggregate($sorted,
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
         |  (a, t) -> named_struct(
         |    'prev', t,
         |    'run', IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L),
         |    'best', GREATEST(a.best, IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L))),
         |  a -> a.best)""".stripMargin
    // longest run AND run count (= distinct values) over a pre-sorted
    // ARRAY<STRUCT<a,b>> in ONE pass — bigram mode and distinct count share
    // the scan instead of paying two
    def bgStats(sorted: String) =
      s"""aggregate($sorted,
         |  named_struct('pa', CAST(NULL AS STRING), 'pb', CAST(NULL AS STRING),
         |    'run', 0L, 'best', 0L, 'n', 0L),
         |  (acc, t) -> named_struct(
         |    'pa', t.a, 'pb', t.b,
         |    'run', IF(acc.pa IS NOT NULL AND t.a = acc.pa AND t.b = acc.pb, acc.run + 1L, 1L),
         |    'best', GREATEST(acc.best,
         |      IF(acc.pa IS NOT NULL AND t.a = acc.pa AND t.b = acc.pb, acc.run + 1L, 1L)),
         |    'n', acc.n + IF(acc.pa IS NOT NULL AND t.a = acc.pa AND t.b = acc.pb, 0L, 1L)),
         |  acc -> named_struct('best', acc.best, 'n', acc.n))""".stripMargin
    // bigrams as (a, b) struct pairs, NOT concatenated strings: tokens have
    // no whitespace so pair equality == joined-string equality, and skipping
    // the concat_ws allocation is ~30% of the bigram build+sort cost
    // (measured). NULL (not empty) below the pair width; quantize coalesces.
    val bigrams = when(size(col("ts")) >= 2,
      transform(sequence(lit(1), size(col("ts")) - 1),
        i => struct(element_at(col("ts"), i).as("a"),
          element_at(col("ts"), i + 1).as("b"))))
    Tables.documents(s, dir)
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"), bigrams.as("bg"))
      .select(col("doc_id"), expr("array_sort(ts)").as("tss"),
        expr("array_sort(bg)").as("bgs"))
      .select(col("doc_id"),
        size(col("tss")).cast("bigint").as("n_tokens"),
        expr(bestRun("tss")).as("tok_mx"),
        expr(bgStats("bgs")).as("bgst"),
        size(col("bgs")).cast("bigint").as("bg_tot"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") === 0, 0L).otherwise(
          q(col("tok_mx").cast("double") / col("n_tokens").cast("double")))
          .as("top_token_frac_q"),
        when(coalesce(col("bg_tot"), lit(0L)) === 0, 0L).otherwise(
          q(col("bgst").getField("best").cast("double") / col("bg_tot").cast("double")))
          .as("top_bigram_frac_q"),
        when(coalesce(col("bg_tot"), lit(0L)) === 0, 0L).otherwise(
          q(lit(1.0) - col("bgst").getField("n").cast("double") / col("bg_tot").cast("double")))
          .as("dup_bigram_frac_q"))
  }

  // PII patterns restricted to syntax Java regex and RE2 share (no
  // lookaround): the pipeline-scrub trio.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  private val phoneRe = "\\+\\d[\\d -]{6,}\\d"

  /** PII detection + masking counts. The synthetic corpus carries no PII, so
    * the entry grafts a DETERMINISTIC contact tail onto each document (both
    * engines derive the identical tail from doc_id) — the point under test is
    * the extraction/masking surface itself: per-doc match counts for the
    * email/IPv4/phone patterns and the md5 of the masked text (emails →
    * <EMAIL>, then IPs → <IP>, then phones → <PHONE>, in that order). */
  def taPii(s: SparkSession, dir: String): DataFrame = {
    def rep(body: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      repeat(body, n.cast("int"))
    val id = col("doc_id")
    val tail = concat(
      rep(concat(lit(" user"), id.cast("string"), lit("@example.com")), id % 3),
      rep(concat(lit(" 10."), (id % 256).cast("string"), lit(".0."),
        (id % 100).cast("string")), id % 2),
      rep(concat(lit(" +1 555-01"), lpad((id % 100).cast("string"), 2, "0")), id % 4))
    Tables.documents(s, dir)
      .select(id, concat(col("text"), tail).as("t2"))
      .select(id,
        size(regexp_extract_all(col("t2"), lit(emailRe), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(col("t2"), lit(ipv4Re), lit(0)))
          .cast("bigint").as("n_ipv4"),
        size(regexp_extract_all(col("t2"), lit(phoneRe), lit(0)))
          .cast("bigint").as("n_phones"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("t2"),
          emailRe, "<EMAIL>"), ipv4Re, "<IP>"), phoneRe, "<PHONE>")).as("masked_md5"))
  }

  /** Bigram-rarity quality signal — the integer-only core of an n-gram LM
    * perplexity proxy: docs whose bigrams are rare in the corpus read as
    * low-quality/outlier text (boilerplate and fluent text share common
    * bigrams). Corpus bigram counts are ONE map-side-combined aggregation;
    * per-doc rarity is one join on the bigram key — both linear, both
    * shuffle-partitioned by content keys, nothing driver-side. Integer
    * counts only (no floating log-prob sums), so the result hashes
    * identically across engines regardless of reduction order. */
  def taBigramRarity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(tok(col("text"))).as(Seq("pos", "w")))
    val bg = docs
      .withColumn("w2",
        lead(col("w"), 1).over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w"), col("w2"))
    val corpus = bg.groupBy(col("w"), col("w2")).agg(count(lit(1)).as("cnt"))
    bg.join(corpus, Seq("w", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt") <= 2, 1L).otherwise(0L)).as("n_rare"))
      .orderBy(col("n_rare").desc, col("doc_id"))
      .limit(20)
  }

  /** Benchmark decontamination — the training-pipeline step that flags
    * train docs overlapping a held-out evaluation set by shared n-grams
    * (the published open-data recipe: a doc is contaminated when it shares
    * at least one distinct n-gram with any benchmark doc; n = 5 here). The
    * deterministic `doc_id % 97 = 0` slice stands in for the eval set.
    *
    * 100 TB shape: the benchmark n-gram set is EVAL-sized (thousands of
    * docs, millions of grams at most), so it BROADCASTS; the train side is
    * one linear tokenize+window pass semi-joined map-side against that set
    * — the corpus never shuffles on content and no all-pairs stage exists.
    * Top-100 worst offenders by distinct hit count, ties by doc_id. */
  def taDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .filter(size(col("ts")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ts) - 4), i -> concat_ws(' ', slice(ts, i, 5)))"))
        .as("g"))
      .distinct()
    val bench = grams.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("n_hits").desc, col("doc_id"))
      .limit(100)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_decontaminate" -> taDecontaminate,
    "ta_bigram_rarity" -> taBigramRarity,
    "ts_offsets" -> tsOffsets,
    "ts_positions" -> tsPositions,
    "ts_highlight" -> tsHighlight,
    "ta_token_stats" -> taTokenStats,
    "ta_bpe_tokens" -> taBpeTokens,
    "ta_quality" -> taQuality,
    "ta_langid" -> taLangId,
    "ta_repetition" -> taRepetition,
    "ta_pii" -> taPii,
    "ta_fingerprint" -> taFingerprint)

  // ---- oracles -------------------------------------------------------------

  private val toks =
    """WITH toks AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
      |  FROM documents)""".stripMargin

  private val bigramRarityOracle =
    s"""$toks,
       |bg AS (SELECT doc_id,
       |  unnest([{'w': ts[i], 'w2': ts[i+1]} FOR i IN range(1, len(ts))]) AS p
       |  FROM toks WHERE len(ts) >= 2),
       |bgf AS (SELECT doc_id, p.w AS w, p.w2 AS w2 FROM bg),
       |corpus AS (SELECT w, w2, count(*) AS cnt FROM bgf GROUP BY w, w2)
       |SELECT b.doc_id, count(*) AS n_bigrams,
       |  CAST(sum(CASE WHEN c.cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
       |FROM bgf b JOIN corpus c USING (w, w2)
       |GROUP BY b.doc_id
       |ORDER BY n_rare DESC, b.doc_id
       |LIMIT 20""".stripMargin

  private val stopwordsDuck =
    Analyzers.EnglishStopwords.toSeq.sorted.map(w => s"'$w'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "ts_offsets" ->
      """WITH RECURSIVE occ(doc_id, t, s) AS (
        |  SELECT doc_id, lower(text), CAST(instr(lower(text), 'vector') AS BIGINT)
        |  FROM documents WHERE instr(lower(text), 'vector') > 0
        |  UNION ALL
        |  SELECT doc_id, t,
        |    s + CAST(instr(substr(t, CAST(s + 1 AS INT)), 'vector') AS BIGINT)
        |  FROM occ
        |  WHERE instr(substr(t, CAST(s + 1 AS INT)), 'vector') > 0
        |)
        |SELECT doc_id, s AS off_start, s + 6 AS off_end FROM occ
        |WHERE (s = 1 OR regexp_matches(substr(t, CAST(s - 1 AS INT), 1), '\s'))
        |  AND (s + 6 > len(t) OR regexp_matches(substr(t, CAST(s + 6 AS INT), 1), '\s'))""".stripMargin,
    // generate_subscripts and unnest zip in lockstep in DuckDB; positions
    // are 0-based token indexes, same base as posexplode at index build
    "ts_positions" ->
      s"""$toks
         |SELECT doc_id, pos FROM (
         |  SELECT doc_id, unnest(ts) AS tok,
         |    CAST(generate_subscripts(ts, 1) - 1 AS BIGINT) AS pos
         |  FROM toks)
         |WHERE tok = 'vector'""".stripMargin,
    "ts_highlight" ->
      s"""$toks
         |SELECT doc_id,
         |  array_to_string(list_transform(ts,
         |    t -> CASE WHEN t = 'vector' THEN concat('<b>', t, '</b>') ELSE t END), ' ')
         |  AS snippet
         |FROM toks WHERE list_contains(ts, 'vector')""".stripMargin,
    "ta_token_stats" ->
      s"""$toks
         |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(ts)) AS BIGINT) AS n_uniq FROM toks""".stripMargin,
    "ta_bpe_tokens" ->
      s"""$toks
         |SELECT t.doc_id,
         |  CAST(len(regexp_extract_all(d.text,
         |    '''(s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+')) AS BIGINT) AS n_bpe,
         |  CAST(len(t.ts) AS BIGINT) AS n_ws
         |FROM toks t JOIN documents d USING (doc_id)""".stripMargin,
    "ta_quality" ->
      s"""$toks
         |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(round(CAST(len(list_distinct(ts)) AS DOUBLE)
         |    / CAST(len(ts) AS DOUBLE) * 10000) AS BIGINT) AS uniq_ratio_q,
         |  CAST(round(CAST(len(list_filter(ts, t -> list_contains($stopwordsDuck, t))) AS DOUBLE)
         |    / CAST(len(ts) AS DOUBLE) * 10000) AS BIGINT) AS stop_ratio_q,
         |  CAST(round(CAST(list_aggregate(list_transform(ts, t -> len(t)), 'sum') AS DOUBLE)
         |    / CAST(len(ts) AS DOUBLE) * 10000) AS BIGINT) AS mean_len_q
         |FROM toks""".stripMargin,
    "ta_langid" -> {
      val counts = langProfiles.map { case (lang, prof) =>
        val lst = prof.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(ts, t -> list_contains($lst, t))) AS h_$lang"
      }.mkString(", ")
      s"""$toks,
         |hits AS (SELECT doc_id, $counts FROM toks)
         |SELECT doc_id,
         |  CASE WHEN h_en + h_de + h_fr + h_es = 0 THEN 'und'
         |       WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
         |       WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
         |       WHEN h_fr >= h_es THEN 'fr'
         |       ELSE 'es' END AS lang_pred
         |FROM hits""".stripMargin
    },
    "ta_decontaminate" ->
      s"""$toks,
         |grams AS (SELECT DISTINCT doc_id, g FROM (
         |  SELECT doc_id,
         |    unnest([array_to_string(ts[i:i+4], ' ') FOR i IN range(1, len(ts) - 3)]) AS g
         |  FROM toks WHERE len(ts) >= 5)),
         |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
         |SELECT doc_id, count(*) AS n_hits
         |FROM grams JOIN bench USING (g)
         |WHERE doc_id % 97 <> 0
         |GROUP BY doc_id ORDER BY n_hits DESC, doc_id LIMIT 100""".stripMargin,
    "ta_bigram_rarity" -> bigramRarityOracle,
    "ta_repetition" ->
      s"""$toks,
         |tokc AS (SELECT doc_id, t, count(*) AS c
         |         FROM (SELECT doc_id, unnest(ts) AS t FROM toks) GROUP BY 1, 2),
         |toka AS (SELECT doc_id,
         |  CAST(round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 10000) AS BIGINT)
         |    AS top_token_frac_q
         |  FROM tokc GROUP BY doc_id),
         |bg AS (SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS b
         |       FROM toks, unnest(range(1, greatest(len(ts), 1))) AS u(i)),
         |bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
         |bga AS (SELECT doc_id,
         |  CAST(round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 10000) AS BIGINT)
         |    AS top_bigram_frac_q,
         |  CAST(round((1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)) * 10000) AS BIGINT)
         |    AS dup_bigram_frac_q
         |  FROM bgc GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
         |  coalesce(toka.top_token_frac_q, 0) AS top_token_frac_q,
         |  coalesce(bga.top_bigram_frac_q, 0) AS top_bigram_frac_q,
         |  coalesce(bga.dup_bigram_frac_q, 0) AS dup_bigram_frac_q
         |FROM toks t LEFT JOIN toka USING (doc_id) LEFT JOIN bga USING (doc_id)""".stripMargin,
    "ta_pii" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipv4 = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
      val phone = "\\+\\d[\\d -]{6,}\\d"
      s"""WITH t2 AS (SELECT doc_id, text ||
         |    repeat(' user' || doc_id || '@example.com', CAST(doc_id % 3 AS INT)) ||
         |    repeat(' 10.' || (doc_id % 256) || '.0.' || (doc_id % 100), CAST(doc_id % 2 AS INT)) ||
         |    repeat(' +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'), CAST(doc_id % 4 AS INT))
         |    AS t2
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t2, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t2, '$ipv4')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(t2, '$phone')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t2,
         |    '$email', '<EMAIL>', 'g'), '$ipv4', '<IP>', 'g'), '$phone', '<PHONE>', 'g'))
         |    AS masked_md5
         |FROM t2""".stripMargin
    },
    "ta_fingerprint" ->
      s"""$toks
         |SELECT doc_id,
         |  CASE WHEN len(ts) >= 5 THEN
         |    list_min(list_transform(range(1, len(ts) - 3),
         |      i -> md5(array_to_string(ts[i:i+4], ' '))))
         |  END AS fp
         |FROM toks""".stripMargin)
}
