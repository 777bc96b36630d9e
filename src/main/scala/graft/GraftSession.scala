package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the graft engine.
  *
  * Defaults are chosen for the local[32] test harness but the same knobs are
  * what you would set on a real cluster: AQE on (runtime re-planning, skew-join
  * splitting), modest shuffle partitions for the local scale, UTC timezone so
  * timestamp arithmetic is stable against the DuckDB oracle.
  */
object GraftSession {
  /** Apply graft's standard configuration to an arbitrary builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // events.parquet carries TIMESTAMP(NANOS) which vanilla Spark rejects;
    // read it as a long (nanos since epoch) and convert in Tables.events.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.mergeSchema", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", shufflePartitions)
        .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Ensure graft settings on an externally created session (Verify/Bench). */
  def adopt(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
