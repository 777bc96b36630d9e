package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The point of bucketing is the PLAN: a join of two tables bucketed on the
  * join key with the same bucket count must not shuffle either side. */
class BucketedJoinSpec extends AnyFunSuite {

  test("join of co-bucketed tables plans no shuffle exchange") {
    val spark = TestSpark.spark
    val dir = TestSpark.sfDir
    Storage.saveBucketed(Tables.orders(spark, dir), "graft_orders_bkt_spec", 16, "o_custkey")
    Storage.saveBucketed(Tables.customer(spark, dir), "graft_customer_bkt_spec", 16, "c_custkey")

    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("graft_orders_bkt_spec")
        .join(spark.table("graft_customer_bkt_spec"),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join:\n$plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"co-bucketed join must not shuffle either side:\n$plan")

      // and the result is the plain join's result
      val want = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    }
  }
}
