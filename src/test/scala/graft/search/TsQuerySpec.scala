package graft.search

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.analysis.WhitespaceAnalyzer
import graft.index.InvertedIndex
import TsQuery._

class TsQuerySpec extends AnyFunSuite {
  private val ws = WhitespaceAnalyzer(lowercase = true)

  test("websearch parse shapes") {
    assert(TsQueryParser.websearch("a b", ws) == And(Seq(Term("a"), Term("b"))))
    assert(TsQueryParser.websearch("a b OR c", ws) ==
      And(Seq(Term("a"), Or(Seq(Term("b"), Term("c"))))))
    assert(TsQueryParser.websearch("\"x y\" -z", ws) ==
      And(Seq(Phrase(Seq("x", "y")), Not(Term("z")))))
    assert(TsQueryParser.plainto("A b C", ws) ==
      And(Seq(Term("a"), Term("b"), Term("c"))))
  }

  test("to_tsquery parse shapes") {
    assert(TsQueryParser.toTsquery("a & b | c", ws) ==
      Or(Seq(And(Seq(Term("a"), Term("b"))), Term("c"))))
    assert(TsQueryParser.toTsquery("a & (b | !c)", ws) ==
      And(Seq(Term("a"), Or(Seq(Term("b"), Not(Term("c")))))))
    assert(TsQueryParser.toTsquery("a <-> b <-> c", ws) ==
      Phrase(Seq("a", "b", "c")))
    assert(TsQueryParser.toTsquery("a <2> b", ws) ==
      PhraseGap(Seq("a", "b"), Seq((2, 2))))
    assert(TsQueryParser.toTsquery("a <-> b <3> c", ws) ==
      PhraseGap(Seq("a", "b", "c"), Seq((1, 1), (3, 3))))
    assert(TsQueryParser.toTsquery("pre:* & x", ws) ==
      And(Seq(Prefix("pre"), Term("x"))))
    intercept[IllegalArgumentException](TsQueryParser.toTsquery("a & (b", ws))
  }

  test("token offsets recover exact character ranges") {
    import graft.analysis.Analyzers
    assert(Analyzers.tokenOffsets("Hello  world") ==
      Seq(("hello", 1, 6), ("world", 8, 13)))
    assert(Analyzers.tokenOffsets("  x ") == Seq(("x", 3, 4)))
    assert(Analyzers.tokenOffsets(null) == Seq.empty)
  }

  test("ES DSL parse shapes") {
    assert(EsDsl.parse("""{"query":{"match":{"text":"a b"}}}""", ws) ==
      Right(Or(Seq(Term("a"), Term("b")))))
    assert(EsDsl.parse("""{"match":{"text":{"query":"a b","operator":"and"}}}""", ws) ==
      Right(And(Seq(Term("a"), Term("b")))))
    assert(EsDsl.parse("""{"query":{"match_phrase":{"text":"a b"}}}""", ws) ==
      Right(Phrase(Seq("a", "b"))))
    assert(EsDsl.parse("""{"query":{"match_all":{}}}""", ws) == Right(All))
    val b = EsDsl.parse(
      """{"query":{"bool":{"must":[{"term":{"text":"a"}}],
        |"must_not":[{"term":{"text":"b"}}],
        |"should":[{"term":{"text":"c"}}],"minimum_should_match":1}}}""".stripMargin, ws)
    assert(b == Left(EsDsl.Bool(Seq(Term("a")), Seq(Term("b")), Seq(Term("c")), 1)))
    // string range bounds parse; numeric bounds are rejected loudly — a
    // stringified numeric would silently compare lexicographically
    // ('10' < '9'), not ES's numeric-field semantics (round-7 ADVICE)
    assert(EsDsl.parse("""{"query":{"range":{"text":{"gte":"b","lt":"d"}}}}""", ws) ==
      Right(TermRange(Some("b"), Some("d"), loInc = true, hiInc = false)))
    val numErr = intercept[IllegalArgumentException](
      EsDsl.parse("""{"query":{"range":{"text":{"gte":10,"lt":20}}}}""", ws))
    assert(numErr.getMessage.contains("lexicographically"))
  }

  test("ES DSL nested bool flattens into the parent query") {
    val nested =
      """{"query": {"bool": {
        |  "must": [{"bool": {"should": [{"term": {"text": "a"}},
        |                                 {"term": {"text": "b"}}]}}],
        |  "must_not": [{"term": {"text": "c"}}]}}}""".stripMargin
    val got = EsDsl.parse(nested, ws)
    assert(got == Left(EsDsl.Bool(
      Seq(And(Seq(Or(Seq(Term("a"), Term("b")))))), Seq(Term("c")), Seq.empty, 0)))
    assert(TsQueryExec.evalTokens(
      And(got.swap.toOption.get.must ++ got.swap.toOption.get.mustNot.map(Not.apply)),
      Seq("b", "x")))
  }

  test("matching equals full-scan evaluation on testdata") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ws.tokens(r.getString(1))).toMap
    val idx = InvertedIndex.build(docs, "doc_id", "text", "whitespace")

    def evalQ(q: TsQuery, ts: Seq[String]): Boolean = q match {
      case All => true
      case Term(t) => ts.contains(t)
      case Prefix(p) => ts.exists(_.startsWith(p))
      case Phrase(ps) => ts.sliding(ps.size).contains(ps)
      case And(qs) => qs.forall(evalQ(_, ts))
      case Or(qs) => qs.exists(evalQ(_, ts))
      case Not(inner) => !evalQ(inner, ts)
      case Boost(inner, _) => evalQ(inner, ts)
    }

    val queries = Seq(
      TsQueryParser.websearch("\"hash join\" OR merge -vector", ws),
      TsQueryParser.websearch("stream -\"hash join\"", ws),
      And(Seq(Prefix("sc"), Not(Term("vector")))),
      Or(Seq(Phrase(Seq("hash", "join")), And(Seq(Term("dup"), Term("query"))))))
    queries.foreach { q =>
      val got = TsQueryExec.matching(idx, q).collect().map(_.getLong(0)).toSet
      val want = toks.collect { case (id, ts) if evalQ(q, ts) => id }.toSet
      assert(got == want, s"query $q")
    }

    // compound with counting
    val got = TsQueryExec.compound(idx,
      Seq(Term("stream")), Seq(Term("batch")),
      Seq(Term("vector"), Term("dup"), Phrase(Seq("hash", "join"))), 2)
      .collect().map(_.getLong(0)).toSet
    val want = toks.collect { case (id, ts)
      if ts.contains("stream") && !ts.contains("batch") &&
        Seq(ts.contains("vector"), ts.contains("dup"),
          ts.sliding(2).contains(Seq("hash", "join"))).count(identity) >= 2 => id
    }.toSet
    assert(got == want)
  }
}
