package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Summarize.ColSpec

class SummarizeSpec extends AnyFunSuite {

  test("profile handles nulls, mixed kinds, and exact medians") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 1.25, "b"), (2L, 2.50, "a"), (3L, null, null), (null, 10.00, "a"))
      .toDF("k", "price", "tag")
    val rows = Summarize.summarize(df, Seq(
        ColSpec("k", "int", "bigint"),
        ColSpec("price", "cents", "double"),
        ColSpec("tag", "string", "string")))
      .collect().map(r => r.getString(0) -> r).toMap

    val k = rows("k")
    assert(k.getLong(2) == 3 && k.getLong(3) == 1 && k.getLong(4) == 3)
    assert(k.getString(5) == "1" && k.getString(6) == "3")
    assert(k.getLong(7) == 6 && k.getDouble(8) == 2.0)

    val p = rows("price")
    assert(p.getLong(2) == 3 && p.getLong(3) == 1)
    // cents units: 125, 250, 1000 -> median 250
    assert(p.getString(5) == "125" && p.getString(6) == "1000")
    assert(p.getDouble(8) == 250.0)

    val t = rows("tag")
    assert(t.getLong(2) == 3 && t.getLong(3) == 1 && t.getLong(4) == 2)
    assert(t.getString(5) == "a" && t.getString(6) == "b")
    assert(t.isNullAt(7) && t.isNullAt(8))
  }

  test("two-level bucketed median is exact on a near-unique column") {
    val spark = TestSpark.spark
    // 100001 distinct values 0..100000 -> spread over ~1024 buckets; the
    // exact interpolated median of 0..100000 is 50000
    val df = spark.range(0, 100001).toDF("v")
    val row = Summarize.summarize(df,
      Seq(ColSpec("v", "int", "bigint"))).collect().head
    assert(row.getLong(4) == 100001L) // ndist exact
    assert(row.getDouble(8) == 50000.0)
    // even count: median of 0..99999 interpolates to 49999.5
    val row2 = Summarize.summarize(spark.range(0, 100000).toDF("v"),
      Seq(ColSpec("v", "int", "bigint"))).collect().head
    assert(row2.getDouble(8) == 49999.5)
  }

  test("plan is histogram-shaped: no Expand, no object (buffer-all) aggregate") {
    val spark = TestSpark.spark
    val df = Summarize.summarize(
      graft.Tables.lineitem(spark, TestSpark.sfDir),
      Seq(ColSpec("l_orderkey", "int", "bigint"),
        ColSpec("l_quantity", "cents", "double"),
        ColSpec("l_returnflag", "string", "string")))
    val plan = df.queryExecution.executedPlan.toString
    // the r6 perf fix: countDistinct's Expand and percentile's
    // ObjectHashAggregate (per-group value buffers) must stay out
    assert(!plan.contains("Expand"), "multi-distinct Expand crept back in")
    assert(!plan.contains("ObjectHashAggregate"),
      "buffer-every-value aggregate crept back in")
  }
}
