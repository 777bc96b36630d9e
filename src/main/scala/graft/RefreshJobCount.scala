package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the Spark JOB count of text-index REFRESH paths (r19 VERDICT
  * #3's "done" criterion: a changeful refresh must drop from 4+ source
  * evaluations to classify + delta re-index). Builds an index over a slice
  * of the sf documents table, then runs three REFRESHes — no-change,
  * append-only growth, and a change+remove reshape — counting jobs via a
  * SparkListener. Usage: runMain graft.RefreshJobCount [sfDir]
  */
object RefreshJobCount {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.configure(
        SparkSession.builder()
          .master("local[32]")
          .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.ensurePublicDb(spark)

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def counted(label: String)(body: => Unit): Unit = {
      // the listener bus is async and private[spark]; a short settle sleep
      // on an idle session is enough for a counting probe
      Thread.sleep(1000); jobs.set(0)
      body
      Thread.sleep(1000)
      println(s"JOBS[$label] = ${jobs.get()}")
    }

    val docs = Tables.documents(spark, dir)
    try graft.search.Ddl.execute(spark, "DROP SEARCH INDEX jobcount_idx")
    catch { case _: IllegalArgumentException => () }
    docs.filter(col("doc_id") < 300).createOrReplaceTempView("jobcount_docs")
    spark.sql("CREATE SEARCH INDEX jobcount_idx ON jobcount_docs (text) " +
      "WITH (id = 'doc_id', analyzer = 'whitespace', key = 'jobcount-spec')")

    counted("no-change")(spark.sql("REFRESH SEARCH INDEX jobcount_idx").collect())

    docs.filter(col("doc_id") < 600).createOrReplaceTempView("jobcount_docs")
    counted("append-only")(spark.sql("REFRESH SEARCH INDEX jobcount_idx").collect())

    // reshape: drop a stripe (removed), rewrite a stripe's text (changed)
    docs.filter(col("doc_id") < 600 && col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" r20changed")))
          .otherwise(col("text")))
      .createOrReplaceTempView("jobcount_docs")
    counted("change+remove")(spark.sql("REFRESH SEARCH INDEX jobcount_idx").collect())

    spark.sql("DROP SEARCH INDEX jobcount_idx")
    spark.stop()
  }
}
