package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** Dialect-level unit coverage (the pattern of Spark's own JDBC dialect
  * suites — no ClickHouse server exists in this container). */
class JdbcDialectSpec extends AnyFunSuite {

  test("registered dialect resolves for clickhouse URLs only") {
    ClickHouseDialect.register()
    ClickHouseDialect.register() // idempotent
    assert(JdbcDialects.get("jdbc:clickhouse://host:8123/db") == ClickHouseDialect)
    assert(JdbcDialects.get("jdbc:postgresql://host/db") != ClickHouseDialect)
  }

  test("identifier quoting uses backticks and escapes them") {
    assert(ClickHouseDialect.quoteIdentifier("a") == "`a`")
    assert(ClickHouseDialect.quoteIdentifier("we`ird") == "`we``ird`")
  }

  test("clickhouse type names map through Nullable/LowCardinality wrappers") {
    def cat(t: String) =
      ClickHouseDialect.getCatalystType(java.sql.Types.OTHER, t, 0, new MetadataBuilder)
    assert(cat("String").contains(StringType))
    assert(cat("Nullable(String)").contains(StringType))
    assert(cat("LowCardinality(Nullable(String))").contains(StringType))
    assert(cat("UInt8").contains(ShortType))
    assert(cat("UInt32").contains(LongType))
    assert(cat("UInt64").contains(DecimalType(20, 0)))
    assert(cat("Int64").contains(LongType))
    assert(cat("Float64").contains(DoubleType))
    assert(cat("Date").contains(DateType))
    assert(cat("DateTime64(3)").contains(TimestampType))
    assert(cat("Decimal(12, 4)").contains(DecimalType(12, 4)))
    assert(cat("SomethingExotic").isEmpty, "unknown types defer to the JDBC fallback")
  }

  test("write-side DDL types round out the dialect") {
    def ddl(dt: DataType) = ClickHouseDialect.getJDBCType(dt).map(_.databaseTypeDefinition)
    assert(ddl(StringType).contains("String"))
    assert(ddl(LongType).contains("Int64"))
    assert(ddl(DoubleType).contains("Float64"))
    assert(ddl(TimestampType).contains("DateTime64(6)"))
    assert(ddl(DecimalType(10, 2)).contains("Decimal(10, 2)"))
  }
}
