package graft.plans

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.analysis.WhitespaceAnalyzer
import graft.search.{TsQueryExec, TsQueryParser, SqlSurface}

/** The search-claim rule must (a) change the PLAN — ts_match leaves the
  * filter and becomes an index semi-join — and (b) not change the RESULT
  * vs row evaluation. */
class ClaimRuleSpec extends AnyFunSuite {

  /** All ScalaUDFs named `name` anywhere in the plan tree — `plan.expressions`
    * alone is NOT recursive, it sees only the root node's expressions. */
  private def udfsIn(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      name: String): Seq[ScalaUDF] =
    plan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case u: ScalaUDF if u.udfName.contains(name) => u })

  private def claimedDf = {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("graft_documents")
    spark.sql(
      """SELECT doc_id FROM graft_documents
        |WHERE ts_match(text, 'stream -batch', 'whitespace') AND n_chars > 100""".stripMargin)
  }

  test("ts_match is claimed into a left-semi index join with residual filter") {
    val optimized = claimedDf.queryExecution.optimizedPlan
    val semiJoins = optimized.collect { case j: Join if j.joinType == LeftSemi => j }
    assert(semiJoins.nonEmpty, s"expected claimed semi-join, got:\n$optimized")
    val leftoverUdfs = udfsIn(optimized, "ts_match")
    assert(leftoverUdfs.isEmpty, "ts_match must not survive as a row-eval filter")
  }

  test("ts_dict aggregate pushdown replaces explode with a dictionary read") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("graft_documents")
    val df = spark.sql(
      """SELECT token, count(DISTINCT doc_id) AS docs, count(*) AS freq
        |FROM (SELECT doc_id, explode(ts_tokenize_sql(text, 'whitespace')) AS token
        |      FROM graft_documents)
        |GROUP BY token""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan
    val generates = optimized.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.isEmpty, s"facet must read the term dict, not explode:\n$optimized")

    // and the dictionary read must equal the brute-force facet
    val ws = WhitespaceAnalyzer(lowercase = true)
    val toks = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ws.tokens(r.getString(1)))
    val want = toks.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1)
      .map { case (t, rows) => (t, rows.map(_._2).distinct.size.toLong, rows.size.toLong) }
      .toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("claimable-filtered facet is rewritten to postings-driven counts") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("graft_documents")
    val df = spark.sql(
      """SELECT token, count(DISTINCT doc_id) AS docs, count(*) AS freq
        |FROM (SELECT doc_id, explode(ts_tokenize_sql(text, 'whitespace')) AS token
        |      FROM graft_documents WHERE ts_match(text, 'stream', 'whitespace'))
        |GROUP BY token""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan
    assert(udfsIn(optimized, "ts_tokenize_sql").isEmpty,
      s"filtered facet must not re-tokenize:\n$optimized")
    assert(udfsIn(optimized, "ts_match").isEmpty)
    val generates = optimized.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.isEmpty, s"filtered facet must drive from postings:\n$optimized")

    // counts must equal the brute-force facet over matching docs only
    val ws = WhitespaceAnalyzer(lowercase = true)
    val toks = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ws.tokens(r.getString(1)))
      .filter(_._2.contains("stream"))
    val want = toks.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1)
      .map { case (t, rows) => (t, rows.map(_._2).distinct.size.toLong, rows.size.toLong) }
      .toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("non-claimable filtered facet still bails to the explode plan") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("graft_documents")
    val df = spark.sql(
      """SELECT token, count(DISTINCT doc_id) AS docs, count(*) AS freq
        |FROM (SELECT doc_id, explode(ts_tokenize_sql(text, 'whitespace')) AS token
        |      FROM graft_documents WHERE lang = 'en')
        |GROUP BY token""".stripMargin)
    val generates = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.nonEmpty, "a non-claimable filter must keep the explode plan")
  }

  test("ANN order-by-limit is claimed into an IVF probe") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    import org.apache.spark.sql.functions._
    val q = Tables.embeddings(spark, TestSpark.sfDir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val df = Tables.embeddings(spark, TestSpark.sfDir)
      .orderBy(call_udf("ann_l2", col("embedding"), typedlit(q)))
      .limit(10)
      .select(col("vec_id"))
    val optimized = df.queryExecution.optimizedPlan
    val leftoverUdfs = udfsIn(optimized, "ann_l2")
    assert(leftoverUdfs.isEmpty, s"ann_l2 sort must be claimed into the IVF probe:\n$optimized")
    // quality: claimed result overlaps exact top-10 at >= 9
    val exact = graft.queries.Vectors.knnExact(spark, TestSpark.sfDir)
      .collect().map(_.getLong(0)).toSet
    val got = df.collect().map(_.getLong(0)).toSet
    assert((got & exact).size >= 9)
  }

  test("filtered facet is NOT claimed — the Filter must survive, counts must be filtered") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("graft_documents")
    val df = spark.sql(
      """SELECT token, count(DISTINCT doc_id) AS docs, count(*) AS freq
        |FROM (SELECT doc_id, explode(ts_tokenize_sql(text, 'whitespace')) AS token
        |      FROM graft_documents WHERE lang = 'en')
        |GROUP BY token""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan
    val generates = optimized.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.nonEmpty,
      s"a facet over a FILTERED scan must keep the explode plan, not read the whole-corpus dict:\n$optimized")

    val ws = WhitespaceAnalyzer(lowercase = true)
    val toks = Tables.documents(spark, TestSpark.sfDir)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ws.tokens(r.getString(1)))
    val want = toks.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1)
      .map { case (t, rows) => (t, rows.map(_._2).distinct.size.toLong, rows.size.toLong) }
      .toSet
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "filtered facet counts must reflect only lang='en' docs")
  }

  test("a facet whose token filter sits between aggregate and explode is NOT claimed") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("graft_documents")
    val df = spark.sql(
      """SELECT token, count(*) AS freq
        |FROM (SELECT doc_id, explode(ts_tokenize_sql(text, 'whitespace')) AS token
        |      FROM graft_documents)
        |WHERE token LIKE 'z%' AND length(token) > 4
        |GROUP BY token""".stripMargin)
    // the token filter happens to be claimable in principle (it commutes with
    // the dict rewrite), but the strict Project-only guard keeps it unclaimed
    // — correctness over cleverness; assert the result is right either way
    val ws = WhitespaceAnalyzer(lowercase = true)
    val want = Tables.documents(spark, TestSpark.sfDir)
      .select("text").collect()
      .flatMap(r => ws.tokens(r.getString(0)))
      .filter(t => t.startsWith("z") && t.length > 4)
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }.toSet
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSet == want)
  }

  test("filtered ANN order-by-limit keeps the exact sort and exact results") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    import org.apache.spark.sql.functions._
    val q = Tables.embeddings(spark, TestSpark.sfDir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val df = Tables.embeddings(spark, TestSpark.sfDir)
      .filter(col("vec_id") % 2 === 0)
      .orderBy(call_udf("ann_l2", col("embedding"), typedlit(q)))
      .limit(10)
      .select(col("vec_id"))
    val optimized = df.queryExecution.optimizedPlan
    val leftoverUdfs = udfsIn(optimized, "ann_l2")
    assert(leftoverUdfs.nonEmpty,
      s"a FILTERED ANN sort must stay exact — claiming would drop the filter:\n$optimized")

    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val want = Tables.embeddings(spark, TestSpark.sfDir)
      .filter(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), l2(r.getSeq[Float](1), q)))
      .sortBy(_._2).take(10).map(_._1).toSet
    assert(df.collect().map(_.getLong(0)).toSet == want)
  }

  test("an aliased non-text column named 'text' is never claimed against the index") {
    val spark = TestSpark.spark
    SqlSurface.registerAll(spark)
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("graft_documents")
    // `source AS text`: the attribute is NAMED text but is not the scanned
    // text column — provenance (exprId) must block the claim
    val df = spark.sql(
      """SELECT doc_id FROM
        |  (SELECT doc_id, source AS text FROM graft_documents)
        |WHERE ts_match(text, 'src1 OR src2', 'whitespace')""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan
    val leftoverUdfs = udfsIn(optimized, "ts_match")
    assert(leftoverUdfs.nonEmpty,
      s"ts_match over an aliased column must stay row-eval:\n$optimized")
    val want = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "source").collect()
      .filter(r => Set("src1", "src2").contains(r.getString(1)))
      .map(_.getLong(0)).toSet
    assert(df.collect().map(_.getLong(0)).toSet == want,
      "row-eval must run over the aliased source values, not the text index")
  }

  test("claimed plan returns exactly the row-eval result") {
    val spark = TestSpark.spark
    val ws = WhitespaceAnalyzer(lowercase = true)
    val q = TsQueryParser.websearch("stream -batch", ws)
    val want = Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text", "n_chars").collect()
      .filter(r => TsQueryExec.evalTokens(q, ws.tokens(r.getString(1))) && r.getLong(2) > 100)
      .map(_.getLong(0)).toSet
    assert(claimedDf.collect().map(_.getLong(0)).toSet == want)
  }
}
