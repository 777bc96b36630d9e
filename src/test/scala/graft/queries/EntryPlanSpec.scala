package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan shape for the round-6 pack entries: filters must reach the
  * parquet scan (PushedFilters) and the scan must read only the columns the
  * entry projects (ReadSchema pruning) — the "would this survive a 100×
  * scale-up" properties, pinned so refactors can't silently lose them. */
class EntryPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.sfDir

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("array_pack pushes its key filter and prunes to two columns") {
    val p = planOf(Extras.arrayPack(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(p_partkey), LessThanOrEqual(p_partkey,2000)]"), p.take(2000))
    assert(p.contains("ReadSchema") && p.contains("p_name") && !p.contains("p_retailprice"))
  }

  test("window_pack pushes its key filter into the orders scan") {
    val p = planOf(Extras.windowPack(spark, dir))
    assert(p.contains("LessThan(o_orderkey,5000)"), p.take(2000))
    assert(!p.contains("o_orderstatus"), "scan must not read unprojected columns")
  }

  test("temporal_agg reads only ts and event_type") {
    val p = planOf(Extras.temporalAgg(spark, dir))
    // don't pin ts's physical encoding — the testdata has shipped both
    // nanos-as-long and timestamp[us]; what matters is the 2-column pruning
    assert("ReadSchema: struct<ts:[^,>]+,event_type:string>".r.findFirstIn(p).isDefined,
      p.take(2000))
  }

  test("summarize_table prunes the lineitem scan to the profiled columns") {
    val p = planOf(Extras.summarizeTable(spark, dir))
    assert(!p.contains("l_discount") && !p.contains("l_tax"),
      "melt must not widen the scan past the profiled columns")
  }
}
