package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Foreign-server JDBC scan — the Spark analogue of the reference's FDW
  * attachments (/root/reference/server/catalog/foreign_server.cpp:54-99,
  * where `CREATE SERVER ... FOREIGN DATA WRAPPER postgres_fdw` attaches an
  * external catalog the planner scans through). Spark's `spark.read.jdbc`
  * is the same operator: the external table becomes a relation with filter
  * and column pushdown INTO the remote SQL, and a partitioned read
  * (`partitionColumn` + bounds + `numPartitions`) turns one remote table
  * into N parallel range-scans — the only JDBC shape that survives a large
  * remote table, since a single-connection read serializes the whole
  * transfer through one task.
  *
  * The test double is embedded Derby (on the Spark classpath for the Hive
  * metastore) standing in for the postgres/clickhouse endpoint; the
  * read-side API is identical for any JDBC URL.
  */
object JdbcTables {

  private def url(dbDir: String) = s"jdbc:derby:$dbDir;create=true"

  private def props(): Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Seed the embedded "foreign server" once per database dir: idempotent —
    * if the table already holds the expected row count, the (driver-side,
    * test-fixture-only) INSERT pass is skipped. */
  def seedCustomer(spark: SparkSession, sfDir: String, dbDir: String): Unit = {
    // Quiet Derby's default derby.log-in-cwd behavior.
    System.setProperty("derby.stream.error.file", s"$dbDir.log")
    val src = graft.Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val expected = src.count()
    val conn = DriverManager.getConnection(url(dbDir))
    try {
      val st = conn.createStatement()
      val have =
        try {
          val rs = st.executeQuery("SELECT COUNT(*) FROM customer_ext")
          rs.next(); rs.getLong(1)
        } catch { case _: java.sql.SQLException => -1L }
      if (have == expected) return
      if (have >= 0) st.executeUpdate("DROP TABLE customer_ext")
    } finally conn.close()
    // Distributed JDBC write: each partition opens its own connection and
    // batch-inserts (Spark's JDBC sink) — the COPY-path shape, not a
    // driver-side row loop. Derby has no TEXT type, so name VARCHARs.
    src.write.mode("overwrite")
      .option("createTableColumnTypes",
        "c_name VARCHAR(64), c_mktsegment VARCHAR(16)")
      .jdbc(url(dbDir), "customer_ext", props())
  }

  /** Partitioned foreign scan: N parallel range-scans on the partition
    * column, each task issuing its own bounded remote query. */
  def readCustomer(spark: SparkSession, dbDir: String,
      maxKey: Long, numPartitions: Int = 8): DataFrame =
    spark.read.jdbc(url(dbDir), "customer_ext",
      columnName = "c_custkey", lowerBound = 0L, upperBound = maxKey + 1,
      numPartitions = numPartitions, connectionProperties = props())

  /** TopN (ORDER BY … LIMIT k) pushed INTO the remote query — the
    * reference's optional-pgscan TopN test
    * (tests/sqllogic/sdb/pg/duckdb_postgres/topn_optional_pgscan.test_slow):
    * the remote server sorts and returns k rows instead of streaming the
    * whole table for a driver-side sort. Spark's V1 jdbc() relation never
    * pushes sort/limit, so this path registers a DSv2 JDBCTableCatalog
    * (the same engine postgres/mysql attachments would use) and lets the
    * V2ScanRelation pushdown negotiate TopN — the scan's `pushedTopN`
    * carries the ORDER BY, and at 100 TB-remote scale this is the
    * difference between k rows and a full-table transfer per query. */
  def topNCatalog(spark: SparkSession, dbDir: String, cat: String = "graft_jdbc"): Unit = {
    DerbyTopNDialect.register() // FETCH FIRST pushdown (see that dialect's doc)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", url(dbDir))
    spark.conf.set(s"spark.sql.catalog.$cat.driver",
      "org.apache.derby.jdbc.EmbeddedDriver")
    spark.conf.set(s"spark.sql.catalog.$cat.pushDownLimit", "true")
  }

  /** Top-k customers by balance through the DSv2 catalog; the plan must
    * show a pushed TopN (asserted in JdbcTablesSpec). */
  def readCustomerTopN(spark: SparkSession, dbDir: String, k: Int): DataFrame = {
    topNCatalog(spark, dbDir)
    // Derby folds unquoted identifiers to upper case; the V2 catalog
    // quotes, so address the table by its stored (upper) name
    spark.sql(
      s"""SELECT c_custkey, c_acctbal FROM graft_jdbc.CUSTOMER_EXT
         |ORDER BY c_acctbal DESC, c_custkey LIMIT $k""".stripMargin)
  }
}
