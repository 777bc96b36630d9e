package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.search.SqlSurface

/** Search-cookbook workflows (reference
  * tests/sqllogic/sdb/pg/site_docs/cookbook/search/ — the 34-file "how
  * users actually search" corpus) composed from the claimed scorer drives
  * and the SQL-visible index relations, each oracle-gated:
  *
  *  - reciprocal-rank-fusion.test → `search_rrf`: two independent claimed
  *    scorer runs (bm25 + tf·idf) fused by 1/(60+rank).
  *  - significant-terms.test → `search_significant_terms`: foreground
  *    (claimed match) vs corpus term frequency ratios read STRAIGHT from
  *    the termdict/postings relations — no re-tokenization.
  *  - recency-and-decay.test → `search_decay`: claimed top-k then a decay
  *    re-rank in the outer query (the two-stage shape the cookbook
  *    teaches: cheap index drive, expensive re-score on k rows).
  *  - similar-documents.test → `search_mlt`: more-like-this via the
  *    source doc's RAREST index terms (df-bounded), candidates ranked by
  *    shared-rare-term count — a pure postings self-join.
  */
object SearchCookbook {

  private def ensureIdx(s: SparkSession, dir: String): Unit = {
    SqlSurface.registerAll(s)
    Tables.documents(s, dir).createOrReplaceTempView("graft_documents")
    graft.search.Ddl.execute(s,
      s"""CREATE SEARCH INDEX docs_claim_idx ON graft_documents (text)
         |WITH (id = 'doc_id', analyzer = 'whitespace', key = '$dir-documents')""".stripMargin)
    graft.index.IndexStore.registerViews(s,
      graft.index.IndexStore.dirFor(s"$dir-documents", "text", "whitespace"), "graft_idx")
  }

  /** RRF over a bm25 run and a tf·idf run of the same query. Ranks order
    * by the QUANTIZED score (FP-stable across engines) with doc_id
    * tiebreak; both inner top-k subqueries keep the claimed shape. */
  def searchRrf(s: SparkSession, dir: String): DataFrame = {
    ensureIdx(s, dir)
    s.sql(
      """WITH fused AS (
        |  SELECT doc_id, RANK() OVER (ORDER BY round(s * 10000) DESC, doc_id) AS rnk
        |  FROM (SELECT doc_id, bm25(text, 'vector dup query', 'whitespace') AS s
        |        FROM graft_documents ORDER BY s DESC LIMIT 20)
        |  UNION ALL
        |  SELECT doc_id, RANK() OVER (ORDER BY round(s * 10000) DESC, doc_id) AS rnk
        |  FROM (SELECT doc_id, tfidf(text, 'vector dup query', 'whitespace') AS s
        |        FROM graft_documents ORDER BY s DESC LIMIT 20)
        |)
        |SELECT doc_id, CAST(round(SUM(1.0 / (60 + rnk)) * 100000) AS BIGINT) AS rrf_q
        |FROM fused GROUP BY doc_id
        |ORDER BY rrf_q DESC, doc_id LIMIT 10""".stripMargin)
  }

  /** Significant terms of the 'vector' foreground: lift = (fg_df / N_fg)
    * / (df / N), everything served by the index relations (postings =
    * (term, doc) pairs, termdict = df) — the significant-terms cookbook's
    * aggregation with zero text re-processing. */
  def searchSignificantTerms(s: SparkSession, dir: String): DataFrame = {
    ensureIdx(s, dir)
    s.sql(
      """WITH fg AS (SELECT doc_id FROM graft_documents
        |            WHERE ts_match(text, 'vector', 'whitespace')),
        |nfg AS (SELECT CAST(count(*) AS DOUBLE) AS n_fg FROM fg),
        |nall AS (SELECT CAST(count(*) AS DOUBLE) AS n_all FROM graft_documents),
        |fgdf AS (SELECT p.term, CAST(count(DISTINCT p.doc_id) AS DOUBLE) AS fg_df
        |         FROM graft_idx_postings p JOIN fg ON p.doc_id = fg.doc_id
        |         GROUP BY p.term)
        |SELECT f.term,
        |       CAST(f.fg_df AS BIGINT) AS fg_df,
        |       CAST(t.df AS BIGINT) AS df,
        |       CAST(round((f.fg_df / n_fg) / (t.df / n_all) * 1000) AS BIGINT) AS lift_q
        |FROM fgdf f JOIN graft_idx_termdict t ON f.term = t.term, nfg, nall
        |WHERE t.df >= 5 AND f.term <> 'vector'
        |ORDER BY lift_q DESC, f.term LIMIT 10""".stripMargin)
  }

  /** Two-stage recency decay: the INNER query is the claimed bm25 top-50
    * drive; the outer re-ranks those 50 rows by score x decay (doc_id as
    * the recency axis in this corpus) — decay never touches the index. */
  def searchDecay(s: SparkSession, dir: String): DataFrame = {
    ensureIdx(s, dir)
    s.sql(
      """SELECT doc_id,
        |       CAST(round(s * (1.0 / (1.0 + (2000 - doc_id) / 500.0)) * 10000) AS BIGINT) AS decayed_q
        |FROM (SELECT doc_id, bm25(text, 'vector dup query', 'whitespace') AS s
        |      FROM graft_documents ORDER BY s DESC LIMIT 50)
        |ORDER BY decayed_q DESC, doc_id LIMIT 10""".stripMargin)
  }

  /** More-like-this for doc 42: its rarest terms (2 <= df <= 20) from the
    * termdict, then candidates ranked by how many of those rare terms
    * they share — one postings self-join, no candidate re-tokenization. */
  def searchMlt(s: SparkSession, dir: String): DataFrame = {
    ensureIdx(s, dir)
    s.sql(
      """WITH src AS (
        |  SELECT DISTINCT p.term FROM graft_idx_postings p
        |  JOIN graft_idx_termdict t ON p.term = t.term
        |  WHERE p.doc_id = 42 AND t.df BETWEEN 2 AND 20),
        |cand AS (
        |  SELECT p.doc_id, count(DISTINCT p.term) AS shared
        |  FROM graft_idx_postings p JOIN src ON p.term = src.term
        |  WHERE p.doc_id <> 42
        |  GROUP BY p.doc_id)
        |SELECT doc_id, CAST(shared AS BIGINT) AS shared
        |FROM cand ORDER BY shared DESC, doc_id LIMIT 10""".stripMargin)
  }

  /** Autocomplete (cookbook autocomplete.test): prefix suggestions with
    * usage counts read STRAIGHT from a keyword index's term dictionary —
    * whole-value terms, `LIKE 'pre%'` prefix band, df as the frequency
    * rank. The dictionary is byte-ordered on term, so at scale the prefix
    * probe is a range scan, never a corpus pass. */
  def searchAutocomplete(s: SparkSession, dir: String): DataFrame = {
    val dict = graft.index.IndexStore.ensure(s, Tables.documents(s, dir),
      s"$dir-docsrc", "doc_id", "source", "keyword",
      withPositions = false).termDict
    dict.where(col("term").like("src1%"))
      .select(col("term").as("suggestion"), col("df").cast("bigint").as("searches"))
      .orderBy(desc("searches"), asc("suggestion")).limit(5)
  }

  /** Spell correction (cookbook spell-correction.test): candidate terms
    * within Levenshtein 2 of the typo, ranked by the reference's
    * similarity = 1 − dist/len(query), popularity (df) tie-break — a pure
    * dictionary probe (the fuzzy automaton's SQL-visible form). */
  def searchSpellCorrect(s: SparkSession, dir: String): DataFrame = {
    ensureIdx(s, dir)
    s.sql(
      """SELECT term AS suggestion,
        |       CAST(round((1.0 - levenshtein(term, 'par') / 3.0) * 1000) AS BIGINT) AS similarity_q,
        |       CAST(df AS BIGINT) AS searches
        |FROM graft_idx_termdict
        |WHERE levenshtein(term, 'par') <= 2
        |ORDER BY similarity_q DESC, searches DESC, suggestion LIMIT 5""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_rrf" -> searchRrf,
    "search_significant_terms" -> searchSignificantTerms,
    "search_decay" -> searchDecay,
    "search_mlt" -> searchMlt,
    "search_autocomplete" -> searchAutocomplete,
    "search_spell_correct" -> searchSpellCorrect)

  private val toks =
    """WITH toks AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "search_autocomplete" ->
      """SELECT source AS suggestion, count(*) AS searches
        |FROM documents WHERE source LIKE 'src1%'
        |GROUP BY source ORDER BY searches DESC, suggestion LIMIT 5""".stripMargin,
    "search_spell_correct" ->
      s"""$toks,
         |dict AS (SELECT unnest(ts) AS term, doc_id FROM toks),
         |d AS (SELECT term, count(DISTINCT doc_id) AS df FROM dict GROUP BY term)
         |SELECT term AS suggestion,
         |       CAST(round((1.0 - levenshtein(term, 'par') / 3.0) * 1000) AS BIGINT) AS similarity_q,
         |       CAST(df AS BIGINT) AS searches
         |FROM d WHERE levenshtein(term, 'par') <= 2
         |ORDER BY similarity_q DESC, searches DESC, suggestion LIMIT 5""".stripMargin,
    "search_rrf" ->
      s"""${Search.scoringCtes},
         |b AS (SELECT doc_id, RANK() OVER (ORDER BY round(score * 10000) DESC, doc_id) AS rnk
         |      FROM (SELECT doc_id, score FROM scored WHERE score > 0
         |            ORDER BY score DESC, doc_id LIMIT 20) x),
         |t2 AS (SELECT doc_id, RANK() OVER (ORDER BY round(score * 10000) DESC, doc_id) AS rnk
         |       FROM (SELECT doc_id, score FROM tscored WHERE score > 0
         |             ORDER BY score DESC, doc_id LIMIT 20) x),
         |fused AS (SELECT * FROM b UNION ALL SELECT * FROM t2)
         |SELECT doc_id, CAST(round(SUM(1.0 / (60 + rnk)) * 100000) AS BIGINT) AS rrf_q
         |FROM fused GROUP BY doc_id
         |ORDER BY rrf_q DESC, doc_id LIMIT 10""".stripMargin,
    "search_significant_terms" ->
      s"""$toks,
         |pairs AS (SELECT DISTINCT doc_id, unnest(ts) AS term FROM toks),
         |fg AS (SELECT doc_id FROM toks WHERE list_contains(ts, 'vector')),
         |nfg AS (SELECT CAST(count(*) AS DOUBLE) AS n_fg FROM fg),
         |nall AS (SELECT CAST(count(*) AS DOUBLE) AS n_all FROM documents),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM pairs GROUP BY term),
         |fgdf AS (SELECT p.term, CAST(count(*) AS DOUBLE) AS fg_df
         |         FROM pairs p JOIN fg USING (doc_id) GROUP BY p.term)
         |SELECT f.term,
         |       CAST(f.fg_df AS BIGINT) AS fg_df,
         |       CAST(d.df AS BIGINT) AS df,
         |       CAST(round((f.fg_df / n_fg) / (d.df / n_all) * 1000) AS BIGINT) AS lift_q
         |FROM fgdf f JOIN df d USING (term), nfg, nall
         |WHERE d.df >= 5 AND f.term <> 'vector'
         |ORDER BY lift_q DESC, f.term LIMIT 10""".stripMargin,
    "search_decay" ->
      s"""${Search.scoringCtes}
         |SELECT doc_id,
         |       CAST(round(score * (1.0 / (1.0 + (2000 - doc_id) / 500.0)) * 10000) AS BIGINT) AS decayed_q
         |FROM (SELECT doc_id, score FROM scored WHERE score > 0
         |      ORDER BY score DESC, doc_id LIMIT 50)
         |ORDER BY decayed_q DESC, doc_id LIMIT 10""".stripMargin,
    "search_mlt" ->
      s"""$toks,
         |pairs AS (SELECT DISTINCT doc_id, unnest(ts) AS term FROM toks),
         |df AS (SELECT term, count(*) AS df FROM pairs GROUP BY term),
         |src AS (SELECT DISTINCT p.term FROM pairs p JOIN df USING (term)
         |        WHERE p.doc_id = 42 AND df BETWEEN 2 AND 20),
         |cand AS (SELECT p.doc_id, count(DISTINCT p.term) AS shared
         |         FROM pairs p JOIN src USING (term)
         |         WHERE p.doc_id <> 42 GROUP BY p.doc_id)
         |SELECT doc_id, CAST(shared AS BIGINT) AS shared
         |FROM cand ORDER BY shared DESC, doc_id LIMIT 10""".stripMargin)
}
