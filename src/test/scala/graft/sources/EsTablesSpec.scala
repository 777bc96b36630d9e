package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EsTablesSpec extends AnyFunSuite {

  private val docs = Seq(
    """{"index": {"_id": "a1"}}""", """{"text": "quick brown fox"}""",
    """{"index": {"_id": "a2"}}""", """{"text": "lazy brown dog"}""",
    """{"index": {"_id": "a3"}}""", """{"text": "quick red fox"}""",
    """{"index": {"_id": "a4"}}""", """{"text": "something else"}""")

  test("bulk + search + count + doc-get + scroll behave like the ES surface") {
    val spark = TestSpark.spark
    val root = sys.props("java.io.tmpdir") + s"/graft-es-spec-${System.nanoTime()}"
    assert(EsTables.bulk(spark, root, "t", docs, overwrite = true) == 4)

    val hits = EsTables.search(spark, root, "t",
      """{"query": {"bool": {"must": [{"term": {"text": "brown"}}],
        |"must_not": [{"term": {"text": "lazy"}}]}}}""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(hits == Set("a1"))

    assert(EsTables.count(spark, root, "t",
      """{"query": {"match": {"text": "quick fox"}}}""") == 2) // OR semantics: a1, a3

    assert(EsTables.docSource(spark, root, "t", "a4").head().getString(0)
      == """{"text":"something else"}""")

    // scroll: two pages of 3 cover all ids in order without overlap
    val p1 = EsTables.scroll(spark, root, "t", None, 3).collect().map(_.getString(0))
    val p2 = EsTables.scroll(spark, root, "t", Some(p1.last), 3).collect().map(_.getString(0))
    assert(p1.toSeq == Seq("a1", "a2", "a3") && p2.toSeq == Seq("a4"))

    // _mapping infers source fields; _cat lists the index with its count
    val m = EsTables.mapping(spark, root, "t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.get("text").contains("string"))
    val cat = EsTables.catIndices(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(cat.get("t").contains(4L))
  }

  test("an indexed es field routes _search through the claim path (LeftSemi, no UDF)") {
    val spark = TestSpark.spark
    val root = sys.props("java.io.tmpdir") + s"/graft-es-claim-${System.nanoTime()}"
    EsTables.bulk(spark, root, "c", docs, overwrite = true)

    // un-indexed row-eval baseline for the same DSL
    val dsl =
      """{"query": {"bool": {
        |  "must": [{"term": {"text": "fox"}}],
        |  "should": [{"term": {"text": "quick"}}, {"term": {"text": "red"}},
        |             {"term": {"text": "lazy"}}],
        |  "minimum_should_match": 2}}}""".stripMargin
    val rowEval = EsTables.search(spark, root, "c", dsl)
      .collect().map(_.getString(0)).toSet

    EsTables.createIndex(spark, root, "c")
    val claimed = EsTables.search(spark, root, "c", dsl)
    val optimized = claimed.queryExecution.optimizedPlan
    val semis = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, s"indexed es _search must drive from postings:\n$optimized")
    val udfs = optimized.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u })
    assert(udfs.isEmpty, s"indexed es _search must not row-eval the DSL:\n$optimized")
    assert(claimed.collect().map(_.getString(0)).toSet == rowEval,
      "claimed and row-eval _search must agree")
    // a3 = fox + (quick, red); a1 = fox + (quick) only
    assert(rowEval == Set("a3"))

    // must_not still works through the claim (anti-join path)
    val dsl2 =
      """{"query": {"bool": {"must": [{"term": {"text": "brown"}}],
        |"must_not": [{"term": {"text": "lazy"}}]}}}""".stripMargin
    assert(EsTables.search(spark, root, "c", dsl2)
      .collect().map(_.getString(0)).toSet == Set("a1"))
  }

  test("range clause matches lexicographic token bounds, row-eval and claimed") {
    val spark = TestSpark.spark
    val root = sys.props("java.io.tmpdir") + s"/graft-es-range-${System.nanoTime()}"
    EsTables.bulk(spark, root, "r", docs, overwrite = true)
    // tokens in [d, m): dog, lazy, fox... fox yes (f<m), else: e<m yes ->
    // a4 matches via "else"; a1 fox; a2 lazy+dog; a3 fox
    val dsl = """{"query": {"range": {"text": {"gte": "d", "lt": "f"}}}}"""
    // [d, f): dog (a2), else (a4)
    def ids() = EsTables.search(spark, root, "r", dsl)
      .collect().map(_.getString(0)).toSet
    assert(ids() == Set("a2", "a4"))
    // claimed path agrees and still plans as a semi-join
    EsTables.createIndex(spark, root, "r")
    assert(ids() == Set("a2", "a4"))
    val optimized = EsTables.search(spark, root, "r", dsl)
      .queryExecution.optimizedPlan
    val semis = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, s"indexed range must drive from the term dict:\n$optimized")
    // bool combining range with a term, exclusive bound
    val dsl2 =
      """{"query": {"bool": {
        |  "must": [{"range": {"text": {"gt": "dog", "lte": "lazy"}}},
        |           {"term": {"text": "brown"}}]}}}""".stripMargin
    // (dog, lazy]: fox, lazy -> a1 (fox), a2 (lazy), a3 (fox); brown -> a1, a2
    assert(EsTables.search(spark, root, "r", dsl2)
      .collect().map(_.getString(0)).toSet == Set("a1", "a2"))
  }

  private val richDocs = Seq(
    """{"index": {"_id": "b1"}}""",
    """{"title": "fox handbook", "text": "quick brown fox"}""",
    """{"index": {"_id": "b2"}}""",
    """{"text": "lazy brown dog"}""",
    """{"index": {"_id": "b3"}}""",
    """{"title": "dog tales"}""")

  test("multi_match / exists / ids / match_phrase_prefix, row-eval and claimed") {
    val spark = TestSpark.spark
    val root = sys.props("java.io.tmpdir") + s"/graft-es-mm-${System.nanoTime()}"
    EsTables.bulk(spark, root, "t", richDocs, overwrite = true)
    def hits(dsl: String): Set[String] =
      EsTables.search(spark, root, "t", dsl).collect().map(_.getString(0)).toSet

    // multi_match across title+text: 'fox' on title (b1) and text (b1)
    assert(hits("""{"query": {"multi_match": {"query": "fox dog",
                  |  "fields": ["title^3", "text"]}}}""".stripMargin)
      == Set("b1", "b2", "b3"), "multi_match must OR per-field matches")
    // operator=and within each field: no single field has both terms
    assert(hits("""{"query": {"multi_match": {"query": "fox dog",
                  |  "fields": ["title", "text"], "operator": "and"}}}""".stripMargin)
      == Set.empty, "multi_match and-operator applies per field")
    // type=phrase_prefix: 'quick br*' phrase only in b1's text
    assert(hits("""{"query": {"multi_match": {"query": "quick br",
                  |  "fields": ["title", "text"], "type": "phrase_prefix"}}}""".stripMargin)
      == Set("b1"))

    assert(hits("""{"query": {"exists": {"field": "title"}}}""")
      == Set("b1", "b3"), "exists = JSON field presence")
    assert(hits("""{"query": {"ids": {"values": ["b2", "b3", "zz"]}}}""")
      == Set("b2", "b3"))
    assert(hits("""{"query": {"bool": {
                  |  "must": [{"exists": {"field": "text"}}],
                  |  "must_not": [{"ids": {"values": ["b1"]}}]}}}""".stripMargin)
      == Set("b2"), "doc-level clauses must compose under bool")

    assert(hits("""{"query": {"match_phrase_prefix": {"text": "quick bro"}}}""")
      == Set("b1"))
    assert(hits("""{"query": {"match_phrase_prefix": {"text": "brown f"}}}""")
      == Set("b1"), "prefix slot must respect the phrase position")
    assert(hits("""{"query": {"match_phrase_prefix": {"text": "qui"}}}""")
      == Set("b1"), "single-token input degenerates to a bare prefix")

    // claimed path: index the text field, same results, exists/ids stay
    // DataFrame filters intersected with the postings hits
    EsTables.createIndex(spark, root, "t", "text", "whitespace")
    assert(hits("""{"query": {"match_phrase_prefix": {"text": "quick bro"}}}""")
      == Set("b1"), "claimed phrase-prefix must chain positions")
    assert(hits("""{"query": {"match_phrase_prefix": {"text": "brown x"}}}""")
      == Set.empty)
    assert(hits("""{"query": {"bool": {
                  |  "must": [{"term": {"text": "brown"}},
                  |           {"exists": {"field": "title"}}]}}}""".stripMargin)
      == Set("b1"), "postings hits must intersect doc-level clauses")
  }

  test("histogram / filters / top_hits aggregations") {
    val spark = TestSpark.spark
    val root = sys.props("java.io.tmpdir") + s"/graft-es-agg2-${System.nanoTime()}"
    EsTables.bulk(spark, root, "t", Seq(
      """{"index": {"_id": "c1"}}""", """{"text": "alpha", "n": 5}""",
      """{"index": {"_id": "c2"}}""", """{"text": "alpha beta", "n": 12}""",
      """{"index": {"_id": "c3"}}""", """{"text": "beta", "n": 14}"""),
      overwrite = true)
    val rows = EsTables.aggs(spark, root, "t",
      """{"query": {"match_all": {}},
        |"aggs": {
        |  "by_n": {"histogram": {"field": "n", "interval": 10}},
        |  "kinds": {"filters": {"filters": {
        |    "alphas": {"match": {"text": "alpha"}},
        |    "betas": {"match": {"text": "beta"}}}}},
        |  "top": {"top_hits": {"size": 2, "sort": [{"n": "desc"}]}}}}""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      ("by_n", "0.0", 1L), ("by_n", "10.0", 2L),
      ("kinds", "alphas", 2L), ("kinds", "betas", 2L),
      ("top", "c3", 1L), ("top", "c2", 2L)))
  }

  test("bool minimum_should_match > 1 enforces per-branch counting") {
    val spark = TestSpark.spark
    val root = sys.props("java.io.tmpdir") + s"/graft-es-msm-${System.nanoTime()}"
    EsTables.bulk(spark, root, "t", docs, overwrite = true)

    // should-only, msm=2: a1 matches 3 branches, a3 matches 2, a2 matches 1
    def hits(dsl: String): Set[String] =
      EsTables.search(spark, root, "t", dsl).collect().map(_.getString(0)).toSet
    assert(hits(
      """{"query": {"bool": {"should": [
        |  {"term": {"text": "quick"}}, {"term": {"text": "brown"}},
        |  {"term": {"text": "fox"}}], "minimum_should_match": 2}}}""".stripMargin)
      == Set("a1", "a3"),
      "msm=2 must keep only docs matching >= 2 should branches")

    // must + should msm=2: must 'fox' ∈ {a1,a3}; should counts a1=1, a3=2
    assert(hits(
      """{"query": {"bool": {"must": [{"term": {"text": "fox"}}],
        |  "should": [{"term": {"text": "quick"}}, {"term": {"text": "red"}},
        |             {"term": {"text": "dog"}}],
        |  "minimum_should_match": 2}}}""".stripMargin)
      == Set("a3"),
      "msm must be counted on top of must clauses, not dropped")
  }
}
