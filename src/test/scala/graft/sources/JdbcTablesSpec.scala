package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The foreign-scan properties that matter at scale: the filter reaches the
  * remote SQL (PushedFilters on the JDBCRelation) and the read plans N
  * parallel range-scan partitions, not one serial transfer. */
class JdbcTablesSpec extends AnyFunSuite {

  test("jdbc scan is partitioned and pushes filters to the remote") {
    val spark = TestSpark.spark
    val dir = TestSpark.sfDir
    val dbDir = sys.props("java.io.tmpdir") + "/graft-derby-spec"
    JdbcTables.seedCustomer(spark, dir, dbDir)
    val maxKey = Tables.customer(spark, dir).agg(max("c_custkey")).head().getLong(0)

    val scan = JdbcTables.readCustomer(spark, dbDir, maxKey, numPartitions = 8)
      .filter(col("c_acctbal") > 1000.0)
      .select("c_custkey", "c_acctbal")

    assert(scan.rdd.getNumPartitions == 8,
      "partitioned jdbc read must produce one task per key range")
    val explained = scan.queryExecution.simpleString + "\n" +
      scan.queryExecution.executedPlan.toString
    assert(explained.contains("PushedFilters") && explained.contains("c_acctbal"),
      s"filter must be pushed into the remote query:\n$explained")

    // values round-trip exactly (bigint keys, double balances, varchars)
    val want = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 1000.0)
      .select("c_custkey", "c_acctbal")
      .collect().map(_.toSeq).toSet
    assert(scan.collect().map(_.toSeq).toSet == want)
  }

  test("ORDER BY + LIMIT pushes TopN into the remote query (DSv2)") {
    val spark = TestSpark.spark
    val dir = TestSpark.sfDir
    val dbDir = sys.props("java.io.tmpdir") + "/graft-derby-spec"
    JdbcTables.seedCustomer(spark, dir, dbDir)

    val top = JdbcTables.readCustomerTopN(spark, dbDir, 10)
    val explained = top.queryExecution.optimizedPlan.toString + "\n" +
      top.queryExecution.executedPlan.toString
    assert(explained.contains("PushedTopN") || explained.contains("pushedTopN"),
      s"ORDER BY + LIMIT must reach the remote scan as TopN:\n$explained")

    val want = Tables.customer(spark, dir)
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .select("c_custkey", "c_acctbal").limit(10)
      .collect().map(_.toSeq)
    assert(top.collect().map(_.toSeq).toSeq == want.toSeq,
      "pushed TopN must return the same rows in the same order")
  }
}
