package graft.plans

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** The secondary-index point lookup must (a) change the PLAN — the scan's
  * FileIndex becomes the zone-pruned candidate list, files-read ≪ total —
  * and (b) not change the RESULT (the full filter stays on top). */
class PkLookupSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  // a sorted multi-file copy: zone pruning needs key-clustered files (same
  // layout a PK table has after ingest sort); the driver fixture is 1 file
  private lazy val root: String = {
    val dir = sys.props("java.io.tmpdir") + "/graft-pk-spec/orders"
    Tables.orders(spark, TestSpark.sfDir)
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def scanLocation(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation => lr.relation.asInstanceOf[HadoopFsRelation].location
    }.get

  private def setup(): Unit = {
    spark.read.parquet(root).createOrReplaceTempView("pk_spec_orders")
    spark.sql("CREATE SECONDARY INDEX pk_spec_idx ON pk_spec_orders (o_orderkey) " +
      "WITH (key = 'pk-spec-orders')")
  }

  test("pk equality claims into a file-pruned scan, result unchanged") {
    setup()
    val keys = spark.read.parquet(root).agg(min("o_orderkey"), max("o_orderkey"))
      .head()
    val (kLo, kHi) = (keys.getLong(0), keys.getLong(1))
    val df = spark.sql(
      s"SELECT o_orderkey, o_custkey FROM pk_spec_orders WHERE o_orderkey = $kLo")
    val loc = scanLocation(df)
    assert(loc.isInstanceOf[PrunedPkFileIndex],
      s"expected zone-pruned scan, got ${loc.getClass}")
    val total = spark.read.parquet(root).inputFiles.length
    assert(total == 8)
    assert(loc.inputFiles.length == 1,
      s"point lookup must read 1 of $total files, read ${loc.inputFiles.length}")
    // result equality vs the unpruned scan
    val want = spark.read.parquet(root)
      .filter(col("o_orderkey") === kLo).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)

    // IN list spanning both ends of the key space → 2 candidate files
    val dfIn = spark.sql(
      s"SELECT o_orderkey FROM pk_spec_orders WHERE o_orderkey IN ($kLo, $kHi)")
    val locIn = scanLocation(dfIn)
    assert(locIn.isInstanceOf[PrunedPkFileIndex] && locIn.inputFiles.length == 2)
    assert(dfIn.collect().map(_.getLong(0)).toSet == Set(kLo, kHi))
  }

  test("a column without a secondary index keeps the full scan") {
    setup()
    val df = spark.sql(
      "SELECT o_orderkey FROM pk_spec_orders WHERE o_custkey = 7")
    assert(!scanLocation(df).isInstanceOf[PrunedPkFileIndex])
  }

  test("a table rewrite after CREATE never drops rows; REFRESH resyncs") {
    setup()
    // rewrite the table in place: new file names, different clustering —
    // every persisted zone now describes a dead file
    Tables.orders(spark, TestSpark.sfDir)
      .repartitionByRange(4, col("o_custkey"))
      .write.mode("overwrite").parquet(root)
    spark.catalog.refreshByPath(root)
    spark.read.parquet(root).createOrReplaceTempView("pk_spec_orders")
    val k = spark.read.parquet(root).agg(min("o_orderkey")).head().getLong(0)
    val df = spark.sql(
      s"SELECT o_orderkey FROM pk_spec_orders WHERE o_orderkey = $k")
    // all live files are unknown to the stale manifest → no pruning is
    // possible, but the result MUST be exact (this returned 0 rows silently
    // before the live-listing reconciliation)
    assert(df.collect().map(_.getLong(0)).toSet == Set(k))
    // REFRESH rebuilds the zones from the live file set → pruning is back
    spark.sql("REFRESH SEARCH INDEX pk_spec_idx")
    val df2 = spark.sql(
      s"SELECT o_orderkey FROM pk_spec_orders WHERE o_orderkey = $k")
    val loc2 = scanLocation(df2)
    assert(loc2.isInstanceOf[PrunedPkFileIndex],
      s"after REFRESH the claim must prune again, got ${loc2.getClass}")
    assert(loc2.inputFiles.length < spark.read.parquet(root).inputFiles.length)
    assert(df2.collect().map(_.getLong(0)).toSet == Set(k))
    // restore the sorted fixture for any later test ordering
    Tables.orders(spark, TestSpark.sfDir)
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(root)
    spark.catalog.refreshByPath(root)
    spark.sql("REFRESH SEARCH INDEX pk_spec_idx")
  }

  test("the claim survives a fresh session via the persisted catalog") {
    setup()
    graft.search.CatalogStore.reset() // simulate a new JVM: lazy re-load
    val df = spark.sql(
      "SELECT o_orderkey FROM pk_spec_orders WHERE o_orderkey = 1")
    assert(scanLocation(df).isInstanceOf[PrunedPkFileIndex],
      "a persisted pk row must claim in a fresh session with no DDL re-run")
  }
}
