package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.streaming.StreamingQueries

/** Oracle-gated Structured-Streaming entries: each runs a REAL stream — the
  * file source over `events.parquet`, a `Trigger.AvailableNow` run to
  * completion, a memory sink — and its final table must hash-match the
  * DuckDB batch oracle. This is the streaming/batch-parity claim the
  * specs make against Spark batch, upgraded to an external oracle.
  */
object StreamGate {

  /** The stream source needs a declared schema; read the batch footer schema
    * of the ACTUAL file rather than assuming one historical encoding of `ts`
    * (TIMESTAMP(NANOS)-as-long vs plain timestamp[us] — the testdata has
    * shipped both). One footer read per (session, dir); `ts` is then
    * normalized per-row with the same branch Tables.events uses. */
  private def sniffedSchema(s: SparkSession, dir: String): StructType =
    s.read.parquet(s"$dir/events.parquet").schema

  /** The file stream source watches a DIRECTORY; the testdata table is a
    * single file, so stage it into one (idempotent, Hadoop-FS copy). The
    * staged dir is keyed by the SOURCE file's length+mtime fingerprint, so a
    * regenerated events.parquet at the same path re-stages instead of
    * silently replaying last generation's bytes. In a real deployment the
    * ingest dir is already a directory of arriving files — this is
    * test-fixture plumbing, not an operator. */
  private def stagedEventsDir(s: SparkSession, dir: String): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val srcP = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val srcFs = srcP.getFileSystem(conf)
    val st = srcFs.getFileStatus(srcP)
    val fp = s"${st.getLen}-${st.getModificationTime}"
    val dst = sys.props("java.io.tmpdir") +
      "/graft-stream-ev-" + dir.replaceAll("[^A-Za-z0-9._-]+", "_") + "-" + fp
    val dstP = new org.apache.hadoop.fs.Path(s"$dst/events.parquet")
    val fs = dstP.getFileSystem(conf)
    if (!fs.exists(dstP)) {
      fs.mkdirs(dstP.getParent)
      org.apache.hadoop.fs.FileUtil.copy(srcFs, srcP, fs, dstP, false, conf)
    }
    dst
  }

  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.adopt(s)
    val schema = sniffedSchema(s, dir)
    s.readStream.schema(schema).parquet(stagedEventsDir(s, dir))
      .withColumn("ts",
        graft.Tables.normalizeTs(schema("ts").dataType, col("ts")))
  }

  private def runToCompletion(df: DataFrame, qname: String,
      mode: OutputMode, statePartitions: Option[Int] = None): Unit = {
    val s = df.sparkSession
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n => s.conf.set("spark.sql.shuffle.partitions", n))
    try {
      val q = df.writeStream.format("memory").queryName(qname)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Watermarked tumbling-window aggregation, run as a stream. Complete
    * mode emits every window at the end, so the result is exactly the batch
    * windowed aggregation (q13's shape through the streaming engine). */
  def streamWindowedAgg(s: SparkSession, dir: String): DataFrame = {
    val qname = "graft_stream_win"
    runToCompletion(StreamingQueries.windowedCounts(eventStream(s, dir)),
      qname, OutputMode.Complete, statePartitions = Some(8))
    s.table(qname)
      .select(col("window_start"), col("event_type"), col("n"), col("value_cents"))
  }

  /** Stateful sessionization (flatMapGroupsWithState), run as a stream; the
    * final update per user must equal the batch lag+running-sum answer
    * (q14's oracle verbatim). Update mode logs every state change; the
    * last row per user (counts grow monotonically) is the final state. */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qname = "graft_stream_sess"
    val ev = eventStream(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_epoch"))
      .as[StreamingQueries.SessionEvent]
    runToCompletion(StreamingQueries.sessionize(ev).toDF(), qname,
      OutputMode.Update, statePartitions = Some(8))
    s.table(qname)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("fin"))
      .select(col("user_id"),
        col("fin.n_sessions").cast("bigint").as("n_sessions"),
        col("fin.n_events").as("n_events"))
  }

  /** Streaming exact dedup (the LLM-ingest shape: drop repeats as they
    * arrive, keep state per key): dropDuplicates over (user_id,
    * event_type) then a running aggregate; the completed stream must equal
    * the batch COUNT(DISTINCT) answer. */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val qname = "graft_stream_dedup"
    runToCompletion(
      eventStream(s, dir)
        .dropDuplicates("user_id", "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique_users")),
      qname, OutputMode.Complete, statePartitions = Some(8))
    s.table(qname)
  }

  /** Streaming ingest into the Iceberg table: each micro-batch commits one
    * append snapshot via foreachBatch (the table-format analogue of the
    * index's two-leg ingest), then the committed table must hold exactly
    * the source rows. AvailableNow + a fresh checkpoint per run keeps the
    * entry deterministic; batch replays are the checkpoint's concern
    * (proven for the index sink in StreamingIngestSpec). */
  def streamIcebergIngest(s: SparkSession, dir: String): DataFrame = {
    val table = sys.props("java.io.tmpdir") +
      "/graft-stream-iceberg-" + dir.replaceAll("[^A-Za-z0-9._-]+", "_")
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(table), true)
    val q = eventStream(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_epoch"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.IcebergTables.append(batch, table): Unit
      }
      .option("checkpointLocation", table + ".ckpt-" + java.util.UUID.randomUUID())
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    graft.sources.IcebergTables.read(s, table)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("ts_epoch")).as("sum_ts"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Stream-stream INTERVAL join (the remaining Structured-Streaming shape:
    * two watermarked streams, a time-bounded join condition so state is
    * evictable): every click joins the same user's views from the preceding
    * 4 hours. Event time is second-truncated BEFORE watermarking so the
    * boundary comparisons match the DuckDB oracle exactly (ns vs µs
    * precision can't flip a `BETWEEN`). Append mode; the completed stream's
    * pair set must equal the batch self-join. */
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val qname = "graft_stream_ij"
    val base = eventStream(s, dir)
      .withColumn("ts", timestamp_seconds(unix_timestamp(col("ts"))))
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
      .withWatermark("vts", "1 hour")
    val joined = clicks.join(views,
      col("cu") === col("vu") &&
        col("vts") >= col("cts") - expr("INTERVAL 4 HOURS") &&
        col("vts") <= col("cts"))
    // A stream-stream join keeps FOUR state stores per shuffle partition,
    // and each store pays fixed per-batch checkpoint IO — so state
    // partition count is a real knob, fixed forever at the checkpoint's
    // first batch. Size it to the stateful operator's load (join state
    // here is tiny), not the session's scan-side default; a production
    // deployment sizes it to state volume the same way.
    runToCompletion(joined, qname, OutputMode.Append,
      statePartitions = Some(8))
    s.table(qname)
      .groupBy(col("cu").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(unix_timestamp(col("cts")) - unix_timestamp(col("vts"))).as("lag_sum"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_windowed_agg" -> streamWindowedAgg,
    "stream_sessionize" -> streamSessionize,
    "stream_dedup" -> streamDedup,
    "stream_interval_join" -> streamIntervalJoin,
    "stream_iceberg_ingest" -> streamIcebergIngest)

  val oracles: Map[String, String] = Map(
    "stream_interval_join" ->
      """WITH c AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS cts
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS vts
        |      FROM events WHERE event_type = 'view')
        |SELECT c.user_id, count(*) AS n_pairs,
        |  CAST(sum(cts - vts) AS BIGINT) AS lag_sum
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.vts >= c.cts - 14400 AND v.vts <= c.cts
        |GROUP BY c.user_id""".stripMargin,
    "stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_unique_users
        |FROM events GROUP BY 1""".stripMargin,
    "stream_iceberg_ingest" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS sum_ts,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,
    "stream_windowed_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "stream_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM (SELECT user_id, SUM(new_session)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |      FROM flagged)
        |GROUP BY user_id""".stripMargin)
}
