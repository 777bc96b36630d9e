package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst sees a native parquet
  * relation: predicate pushdown, column pruning and partition pruning all work
  * unmodified. The only normalization is `events.ts`, whose parquet type is
  * TIMESTAMP(NANOS) (unsupported by Spark's vectorized reader): with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a nanos-epoch
  * long which we convert to a microsecond timestamp with integer division
  * (`div`, not `/`, because nanos-since-2024 exceeds 2^53 and would lose
  * precision through a double).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.adopt(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so spark.sql text mirrors oracle SQL. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
