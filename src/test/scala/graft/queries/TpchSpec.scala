package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Plan-quality gates for the TPC-H suite — correctness is the DuckDB
  * oracle's job (CORRECTNESS entries tpch_q01..q22); these assert the plans
  * scale: date filters must reach the parquet scan as pushed filters (not
  * die at a Cast), and dimension joins must broadcast rather than shuffle. */
class TpchSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def physical(name: String): String = {
    val df = Tpch.all(name)(spark, TestSpark.sfDir)
    df.collect() // materialize so AQE reports the FINAL plan incl. codegen ids
    df.queryExecution.executedPlan.toString
  }

  test("q06's shipdate range reaches the lineitem scan as a pushed filter") {
    val plan = physical("tpch_q06")
    // Catalyst rewrites the view's CAST(l_shipdate AS DATE) range into a raw
    // timestamp range, so the filter survives to the parquet reader (the
    // PushedFilters list renders truncated, hence the line-scoped match)
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\n]*GreaterThanOrEqual\\(l_shipdate[^\\n]*.*"),
      s"expected l_shipdate range in PushedFilters, plan:\n$plan")
  }

  test("q05's nation/region dimensions broadcast; lineitem never broadcasts") {
    val plan = physical("tpch_q05")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.matches("(?s).*BroadcastExchange[^\\n]*\\n[^\\n]*lineitem.*"),
      "lineitem must not be on a broadcast side")
  }

  test("q01 aggregates inside whole-stage codegen") {
    val plan = physical("tpch_q01")
    assert(plan.contains("*("), s"no whole-stage-codegen span (*(n)) in:\n$plan")
    assert(plan.contains("partial_sum"), "expected map-side partial aggregation")
  }
}
