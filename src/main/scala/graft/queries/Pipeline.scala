package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextExprs

/** Corpus-curation operators: the decision layer a training-data pipeline
  * runs AFTER the signal layer (TextPipeline) and the pair layer (Dedup) —
  * deterministic splits, stratified sampling, benchmark-contamination
  * screening, and an end-to-end keep/drop rule chain.
  *
  * Everything here is defined so the DuckDB oracle reproduces it exactly:
  * hash-based decisions use md5 hex (lexicographic threshold compare — no
  * engine-specific integer parsing of hex), ratio thresholds use integer
  * cross-multiplication (no float-boundary ties), and sampling is
  * rank-based, never RNG-based.
  *
  * Scale notes: splits and curation are single-pass projections (plus one
  * shuffle on the dup-group hash); stratified sampling shuffles once on the
  * stratum key; contamination broadcasts the (small, benchmark-sized) eval
  * shingle set and never shuffles the corpus.
  */
object Pipeline {

  private def tok(c: Column) = TextExprs.tokens(c)

  /** Deterministic train/val/test split: the first 4 hex chars of
    * md5("split:" || doc_id) against lexicographic thresholds — 0x0ccd/65536
    * ≈ 5% val, the next ≈ 5% test, rest train. Stable under corpus growth
    * (a doc's split never depends on other rows), reproducible by any
    * engine with md5, and skew-free. */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4)
    Tables.documents(s, dir).select(col("doc_id"),
      when(h < "0ccd", "val").when(h < "199a", "test").otherwise("train").as("split"))
  }

  /** Stratified 10% sample with exact per-stratum quotas: rank docs inside
    * each lang stratum by a salted md5 (salt ≠ the split salt, so sampling
    * is independent of splitting) and keep the top ceil(n/10). Rank-based
    * (not Bernoulli) so quotas are exact per stratum — the property
    * mixture-balancing pipelines actually need. One shuffle on the stratum
    * key; at 100 TB strata are large and uniform, so no skew handling is
    * needed beyond AQE. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val key = md5(concat(lit("sample:"), col("doc_id").cast("string")))
    val byLang = Window.partitionBy(col("lang"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        row_number().over(byLang.orderBy(key, col("doc_id"))).as("rk"),
        count(lit(1)).over(byLang).as("n"))
      // rk <= ceil(n/10) in pure integer math
      .filter(col("rk") <= expr("(n + 9) DIV 10"))
      .select(col("doc_id"), col("lang"))
  }

  /** Benchmark-contamination screen: flag corpus docs sharing any 4-token
    * shingle with the held-out eval slice (docs with doc_id % 97 = 0 — a
    * deterministic stand-in for a benchmark suite). Real pipelines use
    * 8–13-gram windows; 4 here because the synthetic corpus draws from a
    * ~30-word vocabulary, so wider windows never collide (verified: zero
    * 8-gram overlaps at sf0.01) and the entry would test nothing.
    *
    * Scale shape: the eval side is benchmark-sized (≪ corpus), so its
    * distinct shingle set is BROADCAST; the corpus side is a single
    * tokenize-shingle projection feeding a broadcast semi-ish join +
    * per-doc count — the corpus never shuffles. */
  def taContamination(s: SparkSession, dir: String): DataFrame = {
    def shingled(df: DataFrame): DataFrame =
      df.select(col("doc_id"), tok(col("text")).as("ts"))
        .select(col("doc_id"), explode(TextExprs.shinglesOf(col("ts"), 4)).as("sh"))
    val docs = Tables.documents(s, dir)
    val evalSh = shingled(docs.filter(col("doc_id") % 97 === 0))
      .select(col("sh")).distinct()
    // broadcast-join the exploded corpus shingles to the eval set FIRST, then
    // dedup only the (tiny) matching subset — the corpus-wide shingle stream
    // is filtered map-side and never shuffles; only hits reach the distinct
    shingled(docs.filter(col("doc_id") % 97 =!= 0))
      .join(broadcast(evalSh), "sh")
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** End-to-end curation: every doc gets a keep/drop verdict with the FIRST
    * failing rule as the reason — the composition a pipeline user actually
    * deploys over the signal layer:
    *
    *   1. too_short   n_tokens < 20
    *   2. too_long    n_tokens > 400
    *   3. low_uniq    distinct/total < 0.32        (Gopher-style)
    *   4. repetitive  top-token share > 0.14       (Gopher-style)
    *   5. duplicate   exact-dup loser (canonical = min doc_id keeps)
    *   6. ok          keep
    *
    * Ratio rules compare with integer cross-multiplication (uniq*100 < n*32)
    * so no float boundary can disagree between engines. The top-token count
    * is the longest run in the sorted token array — one linear HOF pass, the
    * shuffle-free shape ta_repetition established. The only shuffle is the
    * window over the exact-dup set-hash (the dedup_exact key). */
  def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    val bestRun =
      """aggregate(tss,
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
        |  (a, t) -> named_struct(
        |    'prev', t,
        |    'run', IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L),
        |    'best', GREATEST(a.best, IF(a.prev IS NOT NULL AND t = a.prev, a.run + 1L, 1L))),
        |  a -> a.best)""".stripMargin
    val byHash = Window.partitionBy(col("set_hash"))
    Tables.documents(s, dir)
      .select(col("doc_id"), tok(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"), expr("array_sort(ts)").as("tss"))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n"),
        size(array_distinct(col("ts"))).cast("long").as("uq"),
        expr(bestRun).as("mx"),
        md5(concat_ws(" ", array_sort(array_distinct(col("ts"))))).as("set_hash"))
      .withColumn("canonical_id", min(col("doc_id")).over(byHash))
      .select(col("doc_id"),
        when(col("n") < 20, "too_short")
          .when(col("n") > 400, "too_long")
          .when(col("uq") * 100 < col("n") * 32, "low_uniq")
          .when(col("mx") * 100 > col("n") * 14, "repetitive")
          .when(col("doc_id") =!= col("canonical_id"), "duplicate")
          .otherwise("ok").as("reason"))
      .withColumn("keep", col("reason") === "ok")
  }

  /** Sequence packing for LM training — the "concatenate then chunk" layout
    * (GPT-style packed datasets): within each source shard, docs concatenate
    * in doc_id order and the token stream is cut into fixed-length
    * sequences of `seqLen`; each doc reports the sequence span it lands in
    * and its offset in the first one. Pure prefix-sum over a
    * partitionBy(source) window — no sequential state, so shards pack
    * independently and the operator scales with shard count; a real 100 TB
    * run shards by (source, file) exactly like this. */
  def pipelinePack(s: SparkSession, dir: String, seqLen: Int = 512): DataFrame = {
    val bySource = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), size(tok(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(bySource.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        // integer div, not fp `/`: exact at any cum size (SURVEY oracle rule)
        expr(s"cum_before DIV $seqLen").as("seq_start"),
        (col("cum_before") % seqLen).as("seq_offset"),
        // last sequence this doc touches (empty docs stay in seq_start)
        expr(s"(cum_before + greatest(n_tokens - 1, 0L)) DIV $seqLen").as("seq_end"))
  }

  /** Domain-mixture balancing: cap every lang at the size of the SMALLEST
    * lang (equal-proportion mixture), keeping each stratum's docs by the
    * same salted-hash rank sampleStratified uses — deterministic,
    * quota-exact, and engine-reproducible. One shuffle on the stratum key;
    * the min-count is a broadcast scalar join, not driver state. */
  def pipelineMix(s: SparkSession, dir: String): DataFrame = {
    val key = md5(concat(lit("mix:"), col("doc_id").cast("string")))
    val byLang = Window.partitionBy(col("lang"))
    val quota = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("quota")) // one scalar row — broadcast, not driver state
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        row_number().over(byLang.orderBy(key, col("doc_id"))).as("rk"))
      .crossJoin(broadcast(quota))
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("lang"))
  }

  /** Quality-WEIGHTED deterministic sampling — the data-mixing primitive
    * behind quality/temperature sampling in LLM corpus construction: each
    * doc keeps with probability proportional to a quality weight, with NO
    * RNG state — the accept draw is a pure function of the doc id (first
    * four md5 hex chars → uniform u16), so the sample is reproducible on
    * any cluster at any parallelism, survives retries/speculation, and the
    * oracle recomputes it exactly. One linear pass, no shuffle before the
    * tiny per-lang aggregate. */
  def pipelineWeightedSample(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr("doc_id", "lang", "n_chars",
        "md5(concat('wsample:', cast(doc_id as string))) AS h")
      .selectExpr("doc_id", "lang", "n_chars",
        "(instr('0123456789abcdef', substring(h,1,1))-1)*4096 + " +
          "(instr('0123456789abcdef', substring(h,2,1))-1)*256 + " +
          "(instr('0123456789abcdef', substring(h,3,1))-1)*16 + " +
          "(instr('0123456789abcdef', substring(h,4,1))-1) AS u16",
        "least(1.0, n_chars / 2000.0) AS w")
      .filter(col("u16") < col("w") * 65536)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("chars_kept"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_split" -> sampleSplit,
    "pipeline_weighted_sample" -> pipelineWeightedSample,
    "sample_stratified" -> sampleStratified,
    "ta_contamination" -> taContamination,
    "pipeline_curate" -> pipelineCurate,
    "pipeline_pack" -> ((s, d) => pipelinePack(s, d)),
    "pipeline_mix" -> pipelineMix)

  // ---- oracles -------------------------------------------------------------

  private val toks =
    """WITH toks AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipeline_weighted_sample" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
        |  md5(concat('wsample:', CAST(doc_id AS VARCHAR))) AS h FROM documents),
        |u AS (SELECT lang, n_chars,
        |  (instr('0123456789abcdef', substring(h,1,1))-1)*4096 +
        |  (instr('0123456789abcdef', substring(h,2,1))-1)*256 +
        |  (instr('0123456789abcdef', substring(h,3,1))-1)*16 +
        |  (instr('0123456789abcdef', substring(h,4,1))-1) AS u16,
        |  least(1.0, n_chars / 2000.0) AS w FROM t)
        |SELECT lang, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM u WHERE u16 < w * 65536 GROUP BY lang""".stripMargin,
    "sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5('split:' || doc_id), 1, 4) < '0ccd' THEN 'val'
        |       WHEN substr(md5('split:' || doc_id), 1, 4) < '199a' THEN 'test'
        |       ELSE 'train' END AS split
        |FROM documents""".stripMargin,
    "sample_stratified" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('sample:' || doc_id), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rk <= (n + 9) // 10""".stripMargin,
    "ta_contamination" ->
      s"""$toks,
         |sh AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+3], ' ') AS sh
         |       FROM toks, unnest(range(1, greatest(len(ts) - 2, 1))) AS u(i)
         |       WHERE len(ts) >= 4),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM sh s JOIN ev USING (sh) WHERE s.doc_id % 97 <> 0
         |GROUP BY s.doc_id""".stripMargin,
    "pipeline_pack" ->
      s"""$toks,
         |n AS (SELECT t.doc_id, d.source, CAST(len(t.ts) AS BIGINT) AS n_tokens
         |      FROM toks t JOIN documents d USING (doc_id)),
         |c AS (SELECT doc_id, source, n_tokens,
         |        CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |      FROM n)
         |SELECT doc_id, source, n_tokens,
         |  cum_before // 512 AS seq_start,
         |  cum_before % 512 AS seq_offset,
         |  (cum_before + greatest(n_tokens - 1, 0)) // 512 AS seq_end
         |FROM c""".stripMargin,
    "pipeline_mix" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('mix:' || doc_id), doc_id) AS rk
        |  FROM documents),
        |q AS (SELECT min(n) AS quota FROM
        |  (SELECT count(*) AS n FROM documents GROUP BY lang))
        |SELECT doc_id, lang FROM r, q WHERE rk <= quota""".stripMargin,
    "pipeline_curate" ->
      s"""$toks,
         |tokc AS (SELECT doc_id, t, count(*) AS c
         |         FROM (SELECT doc_id, unnest(ts) AS t FROM toks) GROUP BY 1, 2),
         |sig AS (SELECT t.doc_id,
         |    CAST(len(t.ts) AS BIGINT) AS n,
         |    CAST(len(list_distinct(t.ts)) AS BIGINT) AS uq,
         |    coalesce(m.mx, 0) AS mx,
         |    md5(array_to_string(list_sort(list_distinct(t.ts)), ' ')) AS hsh
         |  FROM toks t LEFT JOIN (SELECT doc_id, max(c) AS mx FROM tokc GROUP BY 1) m
         |  USING (doc_id)),
         |cn AS (SELECT *, min(doc_id) OVER (PARTITION BY hsh) AS canonical_id FROM sig)
         |SELECT doc_id,
         |  CASE WHEN n < 20 THEN 'too_short'
         |       WHEN n > 400 THEN 'too_long'
         |       WHEN uq * 100 < n * 32 THEN 'low_uniq'
         |       WHEN mx * 100 > n * 14 THEN 'repetitive'
         |       WHEN doc_id <> canonical_id THEN 'duplicate'
         |       ELSE 'ok' END AS reason,
         |  (CASE WHEN n < 20 THEN 'too_short'
         |       WHEN n > 400 THEN 'too_long'
         |       WHEN uq * 100 < n * 32 THEN 'low_uniq'
         |       WHEN mx * 100 > n * 14 THEN 'repetitive'
         |       WHEN doc_id <> canonical_id THEN 'duplicate'
         |       ELSE 'ok' END) = 'ok' AS keep
         |FROM cn""".stripMargin)
}
