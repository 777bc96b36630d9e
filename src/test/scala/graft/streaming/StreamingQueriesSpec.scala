package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import StreamingQueries.{SessionEvent, UserSessions}

class StreamingQueriesSpec extends AnyFunSuite {

  test("watermarked windowed counts match the batch aggregation") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Tables.events(spark, TestSpark.sfDir)
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingQueries.windowedCounts(
      stream.toDF().toDF("ts", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("wincounts")
      .outputMode(OutputMode.Append).start()
    try {
      // two micro-batches, then advance the watermark far past all data so
      // every window closes and is emitted in Append mode
      stream.addData(events.take(events.size / 2)); q.processAllAvailable()
      stream.addData(events.drop(events.size / 2)); q.processAllAvailable()
      val maxTs = events.map(_._1.getTime).max
      stream.addData(Seq((new Timestamp(maxTs + 10L * 3600 * 1000), "flush", 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("wincounts")
      .filter(col("event_type") =!= "flush")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = Tables.events(spark, TestSpark.sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("bigint")).as("value_cents"))
      .select(unix_timestamp(col("window.start")), col("event_type"),
        col("n"), col("value_cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("stateful sessionization converges to the batch answer") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Tables.events(spark, TestSpark.sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_epoch"))
      .as[SessionEvent].collect().toSeq.sortBy(e => (e.ts_epoch, e.user_id))

    val stream = MemoryStream[SessionEvent]
    val out = StreamingQueries.sessionize(stream.toDS())
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update).start()
    try {
      // time-ordered batches: state carries sessions across batch boundaries
      events.grouped(math.max(events.size / 4, 1)).foreach { g =>
        stream.addData(g); q.processAllAvailable()
      }
    } finally q.stop()

    // last update per user = final counts
    val got = spark.table("sessions").as[UserSessions].collect()
      .groupBy(_.user_id).map { case (u, rows) =>
        val fin = rows.maxBy(_.n_events) // counts grow monotonically
        (u, fin.n_sessions.toLong, fin.n_events)
      }.toSet
    val want = graft.queries.Relational.q14Sessionize(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
