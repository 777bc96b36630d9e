package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `read_text` — one row per FILE: (filename, content, size,
  * last_modified), the reference's DuckDB built-in that view-backed
  * inverted indexes ingest raw documents through
  * (tests/sqllogic/sdb/pg/index/inverted_index_read_text.test,
  * view_fast_path.cpp MakeTextLookupTableFunction). Spark-first: the
  * `binaryFile` source already does the distributed glob + per-file read
  * (splittable listing, one task per file batch), so this is a typed
  * projection over it — globs, directories, and remote filesystems work
  * exactly as they do for any other Spark path. */
object TextFiles {

  def readText(spark: SparkSession, pattern: String): DataFrame =
    spark.read.format("binaryFile").load(pattern)
      .select(
        col("path").as("filename"),
        decode(col("content"), "UTF-8").as("content"),
        col("length").as("size"),
        col("modificationTime").as("last_modified"))

  /** The shape an index ingests: a stable 64-bit doc id per file (hash of
    * the filename — the analogue of the reference's FileRowNumber PK,
    * deterministic across re-reads of the same layout). */
  def readTextDocs(spark: SparkSession, pattern: String): DataFrame =
    readText(spark, pattern)
      .withColumn("doc_id", xxhash64(col("filename")))
}
