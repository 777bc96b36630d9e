package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Postgres-style sequences (SURVEY.md §1.1/§2.8 — reference
  * server/catalog/sequence.cpp; nextval/currval/setval in
  * server/connector/functions/sequence.cpp:84-132).
  *
  * A distributed engine cannot hand out one value per row from a shared
  * counter without serializing every row through the driver, so the Spark
  * shape is BLOCK allocation: the driver atomically advances the durable
  * counter by the row count (one tiny metadata IO per batch), and rows get
  * `start + row_number() - 1` over a caller-chosen ordering — dense,
  * gap-free within a batch, monotone across batches, exactly the contract
  * bulk `nextval` gives in Postgres.
  */
object Sequences {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currval(spark: SparkSession, seqPath: String): Long = {
    val f = fs(spark, seqPath)
    val p = new Path(seqPath)
    if (!f.exists(p)) 0L
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  def setval(spark: SparkSession, seqPath: String, v: Long): Unit = {
    val f = fs(spark, seqPath)
    val out = f.create(new Path(seqPath), true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Advance the counter by `n`, returning the first allocated value. */
  def nextvalBlock(spark: SparkSession, seqPath: String, n: Long): Long = {
    val cur = currval(spark, seqPath)
    setval(spark, seqPath, cur + n)
    cur + 1
  }

  /** Assign sequence values to every row of `df` as column `colName`,
    * ordered by `order` (dense, gap-free for this batch). */
  def assignIds(df: DataFrame, seqPath: String, colName: String,
      order: Seq[String]): DataFrame = {
    val n = df.count()
    val start = nextvalBlock(df.sparkSession, seqPath, n)
    val w = Window.orderBy(order.map(col): _*)
    df.withColumn(colName, row_number().over(w).cast("long") + lit(start - 1))
  }
}
