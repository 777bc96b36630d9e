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
    val leftoverUdfs = optimized.expressions.flatMap(_.collect {
      case u: ScalaUDF if u.udfName.contains("ts_match") => u
    })
    assert(leftoverUdfs.isEmpty, "ts_match must not survive as a row-eval filter")
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
