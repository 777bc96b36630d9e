package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.analysis.AnalyzerRegistry
import graft.functions.VectorFunctions
import graft.index.{IndexStore, InvertedIndex}
import graft.search.{EsDsl, TsQuery, TsQueryExec, TsQueryParser}

/** Query-language surface: TSQUERY parsers + combinators, the compound bool
  * query, the ES DSL translator, covered columns (late materialization) and
  * hybrid text+vector search. Every entry is oracle-checked against DuckDB
  * recomputing the same predicate from raw text (demo6's no-postings
  * cross-check pattern).
  */
object QueryLang {

  private def idx(s: SparkSession, dir: String): InvertedIndex =
    IndexStore.documents(s, dir, "whitespace")

  private def ws = AnalyzerRegistry.get("whitespace")

  /** websearch_to_tsquery surface (ts_query.cpp; demo3 §2b):
    * `"hash join" OR merge -vector` → (phrase || merge) && !vector. */
  def tsWebsearch(s: SparkSession, dir: String): DataFrame =
    TsQueryExec.matching(idx(s, dir),
      TsQueryParser.websearch("\"hash join\" OR merge -vector", ws))

  /** plainto_tsquery: analyzed conjunction. */
  def tsPlainto(s: SparkSession, dir: String): DataFrame =
    TsQueryExec.matching(idx(s, dir), TsQueryParser.plainto("Hash JOIN", ws))

  /** to_tsquery: full boolean syntax incl. `<->` adjacency and `<N>` exact
    * distance and `:*` prefix (ts_query.cpp). */
  def tsToTsquery(s: SparkSession, dir: String): DataFrame =
    TsQueryExec.matching(idx(s, dir),
      TsQueryParser.toTsquery("(hash <-> join) & vect:* | scan <2> filter", ws))

  /** ts_compound — the reference's TSQUERY[]-bucket boolean filter
    * (ts_compound.cpp FromCompound: must/must_not/should buckets +
    * min_should_match; NOT word decompounding — that is `ts_decompound`
    * below): stream && !batch && (≥2 of vector, dup, "hash join"). */
  def tsCompound(s: SparkSession, dir: String): DataFrame =
    TsQueryExec.compound(idx(s, dir),
      must = Seq(TsQuery.Term("stream")),
      mustNot = Seq(TsQuery.Term("batch")),
      should = Seq(TsQuery.Term("vector"), TsQuery.Term("dup"),
        TsQuery.Phrase(Seq("hash", "join"))),
      minShouldMatch = 2)

  /** ts_decompound: dictionary-driven compound-word search. The query word
    * is decompounded against the index's OWN term dictionary — the O(len²)
    * candidate substrings are probed with one bucket-pruned IN lookup
    * (never a dictionary scan), greedy longest-match picks the split
    * (analysis.Decompound), and docs matching ALL subwords are returned:
    * 'hashjoin' finds the "hash join" documents. */
  def tsDecompound(s: SparkSession, dir: String): DataFrame = {
    val index = idx(s, dir)
    val word = "hashjoin"
    val cands = (for { i <- 0 until word.length; j <- (i + 3) to word.length }
      yield word.substring(i, j)).distinct
    val present = index.termDict.filter(col("term").isin(cands: _*))
      .select(col("term")).collect().map(_.getString(0)).toSet
    val parts = graft.analysis.Decompound.split(word, present)
    TsQueryExec.matching(index, TsQuery.And(parts.map(TsQuery.Term(_))))
  }

  /** ES query DSL in, doc ids out (dsl.cpp:147-394). */
  def esDslSearch(s: SparkSession, dir: String): DataFrame = {
    val json =
      """{"query": {"bool": {
        |  "must": [{"match": {"text": {"query": "hash join", "operator": "and"}}}],
        |  "must_not": [{"term": {"text": "merge"}}],
        |  "should": [{"match": {"text": "dup vector"}}],
        |  "minimum_should_match": 1
        |}}}""".stripMargin
    EsDsl.parse(json, ws) match {
      case Left(b) => TsQueryExec.compound(idx(s, dir), b.must, b.mustNot, b.should, b.minShouldMatch)
      case Right(q) => TsQueryExec.matching(idx(s, dir), q)
    }
  }

  /** Covered columns via late materialization: the index resolves matching
    * doc ids, then ONE join back to the table fetches the covered columns —
    * the reference's INCLUDE-column / PK-lookup path
    * (search_pk_lookup.h; EXPLAIN in vector_search.test:19-37 shows
    * `Projections: id, score` + PK resolution). */
  def tsCoveredSearch(s: SparkSession, dir: String): DataFrame =
    TsQueryExec.matching(idx(s, dir), TsQuery.Term("vector"))
      .join(Tables.documents(s, dir), "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** Hybrid search (demo4/demo5 pattern): full-text filter, then vector
    * re-rank of the surviving candidates — the text match prunes before any
    * distance is computed, so the ANN side only scores the candidate set. */
  def hybridSearch(s: SparkSession, dir: String): DataFrame = {
    val matched = TsQueryExec.matching(idx(s, dir), TsQuery.Term("vector"))
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.join(matched.withColumnRenamed("doc_id", "vec_id"), "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("dist", VectorFunctions.cosineDistance(col("embedding"), col("qe")))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)
      .select(col("vec_id"))
  }

  /** Label-filtered ANN (vector_search.test's filtered probe): the filter is
    * pushed to the parquet scan, distances computed on the survivors only. */
  def vecLabelKnn(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.filter(col("label") === 3)
      .crossJoin(broadcast(q))
      .withColumn("dist", VectorFunctions.l2SqrDistance(col("embedding"), col("qe")))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)
      .select(col("vec_id"))
  }

  /** Deletes-aware search: a dedicated index copy tombstones docs 0..9; the
    * query must not see them, and facet/idf stats shift accordingly
    * (the reference's delete path + deletes-aware ts_dict tests). */
  def tsDeletes(s: SparkSession, dir: String): DataFrame = {
    val delDir = IndexStore.defaultRoot + "/" +
      dir.replaceAll("[^A-Za-z0-9._-]+", "_") + s"-deltest-v${IndexStore.FormatVersion}"
    if (IndexStore.listSegments(s, delDir).isEmpty) {
      IndexStore.appendSegment(
        graft.index.InvertedIndex.build(
          Tables.documents(s, dir), "doc_id", "text", "whitespace"), delDir)
      IndexStore.delete(s, delDir, (0L until 10L).toSeq)
    }
    IndexStore.load(s, delDir).term("vector")
  }

  /** Facets reflect deletes (reference ts_dict_deletes.test /
    * ts_dict_where_deletes.test / ts_dict_deletes_matrix.test): after a
    * DELETE the term dictionary's df/ctf must exclude tombstoned docs —
    * IndexStore.load re-derives the dictionary from live postings whenever
    * tombstones exist, so every facet consumer gets post-delete counts with
    * no rebuild. Shares the deltest index (docs 0-9 deleted). */
  def tsDictDeletes(s: SparkSession, dir: String): DataFrame = {
    val delDir = IndexStore.defaultRoot + "/" +
      dir.replaceAll("[^A-Za-z0-9._-]+", "_") + s"-deltest-v${IndexStore.FormatVersion}"
    if (IndexStore.listSegments(s, delDir).isEmpty) {
      IndexStore.appendSegment(
        graft.index.InvertedIndex.build(
          Tables.documents(s, dir), "doc_id", "text", "whitespace"), delDir)
      IndexStore.delete(s, delDir, (0L until 10L).toSeq)
    }
    IndexStore.load(s, delDir).termDict
      .filter(col("term").startsWith("st"))
      .select(col("term"), col("df").cast("bigint").as("docs"),
        col("ctf").cast("bigint").as("freq"))
  }

  /** The headline option surface (reference headline.test): the
    * ts_highlight POSTINGS overload with StartSel/StopSel, the MaxWords
    * window starting at the first hit, and the no-hit fallback — legs
    * mirror the ported sqllogic goldens; full matrix incl. error paths in
    * headline.test. */
  def tsHeadline(s: SparkSession, dir: String): DataFrame = {
    graft.search.SqlSurface.registerAll(s)
    s.sql(
      """SELECT 'basic' AS leg,
        |       ts_highlight('the quick brown fox jumps', array(4, 9)) AS h
        |UNION ALL SELECT 'delims',
        |  ts_highlight_opts('the quick brown fox', array(4, 9),
        |                    'StartSel=[, StopSel=]')
        |UNION ALL SELECT 'window',
        |  ts_highlight_opts('a b c d e f g h i j', array(8, 9), 'MaxWords=3')
        |UNION ALL SELECT 'fallback',
        |  ts_highlight_opts('one two three four five six', array(),
        |                    'MaxWords=3')""".stripMargin)
  }

  /** ES term-level query clauses (dsl.cpp: prefix / wildcard / regexp /
    * fuzzy) — each translated to the matching TsQuery leaf: ES `*`/`?`
    * wildcard syntax maps to the automaton walk's LIKE-style pattern, ES
    * regexp is whole-term anchored, fuzziness AUTO follows the ES length
    * ladder. */
  def esDslTermLevel(s: SparkSession, dir: String): DataFrame = {
    def leg(json: String, tag: String): DataFrame =
      (EsDsl.parse(json, ws) match {
        case Right(q) => TsQueryExec.matching(idx(s, dir), q)
        case Left(b) => TsQueryExec.compound(idx(s, dir),
          b.must, b.mustNot, b.should, b.minShouldMatch)
      }).select(lit(tag).as("leg"), col("doc_id"))
    leg("""{"query": {"prefix": {"text": "sc"}}}""", "prefix")
      .unionByName(leg("""{"query": {"wildcard": {"text": "s*t"}}}""", "wildcard"))
      .unionByName(leg("""{"query": {"regexp": {"text": "va..e"}}}""", "regexp"))
      .unionByName(leg(
        """{"query": {"fuzzy": {"text": {"value": "qery", "fuzziness": 1}}}}""",
        "fuzzy"))
  }

  /** Search over RAW TEXT FILES through the read_text source (reference
    * inverted_index_read_text.test: DuckDB's read_text built-in feeding a
    * view-backed inverted index — one row per file, FileRowNumber PK).
    * The fixture path is FIXED so the DuckDB oracle reads the same bytes
    * through its own read_text; the slug projection keeps assertions
    * path-stable, as the reference test does. */
  def readTextIndex(s: SparkSession, dir: String): DataFrame = {
    // literal /tmp (not java.io.tmpdir): the DuckDB oracle reads the SAME
    // files through its own read_text and oracle SQL is static text
    val root = "/tmp/graft-readtext"
    new java.io.File(root).mkdirs()
    def put(name: String, text: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/$name"), text)
    put("alpha.md", "inverted index primer\nthe inverted index maps terms to posting lists\n")
    put("bravo.md", "bm25 ranking explained\nscores combine term frequency with document length\n")
    put("charlie.md", "analyzers normalize text\ntokens lowercase before the index build\n")
    val docs = graft.sources.TextFiles.readTextDocs(s, s"$root/*.md")
    val idx = IndexStore.ensure(s, docs, "readtext-fixed",
      "doc_id", "content", "whitespace")
    idx.term("index").join(docs, "doc_id")
      .select(regexp_extract(col("filename"), "([a-z]+)\\.md$", 1).as("slug"),
        col("size"))
  }

  /** Raw-term (keyword) column index over a SECOND table — the reference's
    * non-tokenized opclass (`label` bare column, inverted_index.h:59-69):
    * events.event_type indexed whole-value, facet read from the term dict. */
  def kwIndexFacet(s: SparkSession, dir: String): DataFrame =
    IndexStore.ensure(s, Tables.events(s, dir), s"$dir-events",
        "event_id", "event_type", "keyword", withPositions = false)
      .termDict
      .select(col("term"), col("df").cast("bigint").as("docs"),
        col("ctf").cast("bigint").as("freq"))

  /** Move-budget sloppy phrase (reference `ts_phrase(..., slop := N)` /
    * `"..."~N`, sloppy_phrase.test): slop 0 = exact phrase, one inserted
    * word costs 1, a transposed adjacent pair costs 2, the budget shared
    * across gaps. Three counts pin the budget semantics; slop 2 drives
    * through the `"..."~N` to_tsquery syntax so the parser path is covered
    * too. */
  def tsSlopPhrase(s: SparkSession, dir: String): DataFrame = {
    val index = idx(s, dir)
    def cnt(q: TsQuery, as: String): DataFrame =
      TsQueryExec.matching(index, q).agg(count(lit(1)).cast("bigint").as(as))
    cnt(TsQueryParser.toTsquery("\"hash join\"~0", ws), "n_slop0")
      .crossJoin(cnt(TsQuery.SlopPhrase(Seq("hash", "join"), 1), "n_slop1"))
      .crossJoin(cnt(TsQueryParser.toTsquery("\"hash join\"~2", ws), "n_slop2"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_slop_phrase" -> tsSlopPhrase,
    "kw_index_facet" -> kwIndexFacet,
    "ts_deletes" -> tsDeletes,
    "ts_dict_deletes" -> tsDictDeletes,
    "read_text_index" -> readTextIndex,
    "es_dsl_term_level" -> esDslTermLevel,
    "ts_headline" -> tsHeadline,
    "ts_websearch" -> tsWebsearch,
    "ts_plainto" -> tsPlainto,
    "ts_to_tsquery" -> tsToTsquery,
    "ts_compound" -> tsCompound,
    "ts_decompound" -> tsDecompound,
    "es_dsl_search" -> esDslSearch,
    "ts_covered_search" -> tsCoveredSearch,
    "hybrid_search" -> hybridSearch,
    "vec_label_knn" -> vecLabelKnn)

  // ---- oracles -------------------------------------------------------------

  private val toks =
    """WITH toks AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
      |  FROM documents)""".stripMargin

  private val phraseHashJoin =
    "' ' || array_to_string(ts, ' ') || ' ' LIKE '% hash join %'"

  val oracles: Map[String, String] = Map(
    "ts_slop_phrase" ->
      s"""$toks,
         |pos AS (SELECT doc_id,
         |  [i FOR i IN range(1, len(ts) + 1) IF ts[i] = 'hash'] AS p1,
         |  [i FOR i IN range(1, len(ts) + 1) IF ts[i] = 'join'] AS p2
         |  FROM toks)
         |SELECT
         |  (SELECT count(*) FROM pos WHERE len(list_filter(p1,
         |     a -> len(list_filter(p2, b -> b = a + 1)) > 0)) > 0) AS n_slop0,
         |  (SELECT count(*) FROM pos WHERE len(list_filter(p1,
         |     a -> len(list_filter(p2, b -> b != a AND abs(b - a - 1) <= 1)) > 0)) > 0) AS n_slop1,
         |  (SELECT count(*) FROM pos WHERE len(list_filter(p1,
         |     a -> len(list_filter(p2, b -> b != a AND abs(b - a - 1) <= 2)) > 0)) > 0) AS n_slop2
         |""".stripMargin,
    "kw_index_facet" ->
      """SELECT event_type AS term, count(*) AS docs, count(*) AS freq
        |FROM events GROUP BY event_type""".stripMargin,
    "ts_deletes" ->
      s"""$toks
         |SELECT doc_id FROM toks
         |WHERE doc_id >= 10 AND list_contains(ts, 'vector')""".stripMargin,
    "ts_dict_deletes" ->
      s"""$toks
         |SELECT t AS term, count(DISTINCT doc_id) AS docs,
         |       count(*) AS freq
         |FROM (SELECT doc_id, unnest(ts) AS t FROM toks WHERE doc_id >= 10)
         |WHERE t LIKE 'st%'
         |GROUP BY t""".stripMargin,
    "ts_headline" ->
      """SELECT * FROM (VALUES
        |  ('basic', 'the <b>quick</b> brown fox jumps'),
        |  ('delims', 'the [quick] brown fox'),
        |  ('window', '<b>e</b> f g'),
        |  ('fallback', 'one two three')) AS t(leg, h)""".stripMargin,
    "es_dsl_term_level" ->
      s"""$toks
         |SELECT 'prefix' AS leg, doc_id FROM toks
         |WHERE len(list_filter(ts, t -> t LIKE 'sc%')) > 0
         |UNION ALL
         |SELECT 'wildcard', doc_id FROM toks
         |WHERE len(list_filter(ts, t -> t LIKE 's%t')) > 0
         |UNION ALL
         |SELECT 'regexp', doc_id FROM toks
         |WHERE len(list_filter(ts, t -> regexp_matches(t, '^va..e$$'))) > 0
         |UNION ALL
         |SELECT 'fuzzy', doc_id FROM toks
         |WHERE len(list_filter(ts, t -> damerau_levenshtein(t, 'qery') <= 1)) > 0""".stripMargin,
    "read_text_index" ->
      """SELECT regexp_extract(filename, '([a-z]+)\.md$', 1) AS slug,
        |       size
        |FROM read_text('/tmp/graft-readtext/*.md')
        |WHERE list_contains(
        |  list_filter(string_split_regex(lower(content), '\s+'), x -> x <> ''),
        |  'index')""".stripMargin,
    "ts_websearch" ->
      s"""$toks
         |SELECT doc_id FROM toks
         |WHERE (($phraseHashJoin) OR list_contains(ts, 'merge'))
         |  AND NOT list_contains(ts, 'vector')""".stripMargin,
    "ts_plainto" ->
      s"""$toks
         |SELECT doc_id FROM toks WHERE list_has_all(ts, ['hash', 'join'])""".stripMargin,
    "ts_to_tsquery" ->
      s"""$toks
         |SELECT doc_id FROM toks
         |WHERE (($phraseHashJoin)
         |       AND len(list_filter(ts, t -> t LIKE 'vect%')) > 0)
         |   OR regexp_matches(' ' || array_to_string(ts, ' ') || ' ',
         |        ' scan [a-z0-9]+ filter ')""".stripMargin,
    "ts_compound" ->
      s"""$toks
         |SELECT doc_id FROM toks
         |WHERE list_contains(ts, 'stream') AND NOT list_contains(ts, 'batch')
         |  AND (CASE WHEN list_contains(ts, 'vector') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(ts, 'dup') THEN 1 ELSE 0 END
         |     + CASE WHEN $phraseHashJoin THEN 1 ELSE 0 END) >= 2""".stripMargin,
    "ts_decompound" ->
      s"""$toks
         |SELECT doc_id FROM toks WHERE list_has_all(ts, ['hash', 'join'])""".stripMargin,
    "es_dsl_search" ->
      s"""$toks
         |SELECT doc_id FROM toks
         |WHERE list_has_all(ts, ['hash', 'join'])
         |  AND NOT list_contains(ts, 'merge')
         |  AND (list_contains(ts, 'dup') OR list_contains(ts, 'vector'))""".stripMargin,
    "ts_covered_search" ->
      s"""$toks
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d JOIN toks USING (doc_id)
         |WHERE list_contains(ts, 'vector')""".stripMargin,
    "hybrid_search" ->
      s"""$toks
         |SELECT e.vec_id
         |FROM embeddings e
         |JOIN toks t ON t.doc_id = e.vec_id
         |WHERE list_contains(t.ts, 'vector')
         |ORDER BY 1.0 - list_cosine_similarity(e.embedding::DOUBLE[],
         |  (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), e.vec_id
         |LIMIT 10""".stripMargin,
    "vec_label_knn" ->
      """SELECT vec_id FROM embeddings
        |WHERE label = 3
        |ORDER BY list_distance(embedding::DOUBLE[],
        |  (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), vec_id
        |LIMIT 10""".stripMargin)
}
