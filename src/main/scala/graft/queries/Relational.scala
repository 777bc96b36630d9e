package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin

/** Core relational operator coverage (SURVEY.md §2.1–§2.7).
  *
  * These exercise what Catalyst gives for free — scans with pushdown, hash /
  * broadcast / semi / anti joins, partial+final aggregation, grouping sets,
  * windows, set ops, top-k — plus graft's own as-of join operator. Each query
  * has a DuckDB oracle (see SparkEntry.oracleSql); outputs are integers,
  * strings or epoch seconds so hashes are stable across engines (money is
  * summed in integer cents/basis-points: a double sum of non-integral values
  * is order-dependent under parallel aggregation, an integer sum is exact).
  */
object Relational {

  /** TPC-H Q1 shape: full-scan aggregate with map-side partial aggregation.
    * Reference conformance: /root/reference/tests/sqllogic/sdb/pg/any/tpch/tpch.test Q1. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("bigint")).as("sum_base_cents"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("bigint")).as("sum_disc_bp"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shape: 3-way join (dim filter → fact), agg, deterministic top-k. */
  def q02ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
        .cast("bigint")).as("revenue_bp"))
      .select(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("order_epoch"),
        col("o_orderpriority"), col("revenue_bp"))
      .orderBy(col("revenue_bp").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Small-dim broadcast join chain: customer → nation → region roll-up. */
  def q03RegionRollup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(round(col("c_acctbal") * 100).cast("bigint")).as("acctbal_cents"))

  /** Left-semi join: orders having at least one big-quantity lineitem. */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Left-anti join: customers with no high-value order. */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))

  /** Window function: latest order per customer (deterministic tie-break). */
  def q06LatestOrderPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        unix_timestamp(col("o_orderdate")).as("latest_epoch"))
  }

  /** ROLLUP grouping sets with GROUPING() disambiguation of the NULL rows. */
  def q07Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))

  /** Set operations: nation keys with customers vs with suppliers. */
  def q08SetOps(s: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val both = cn.intersect(sn).withColumn("tag", lit("both"))
    val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
    val suppOnly = sn.except(cn).withColumn("tag", lit("supp_only"))
    both.union(custOnly).union(suppOnly)
  }

  /** DISTINCT aggregates + FILTER clause per group. */
  def q09DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(when(col("o_totalprice") > 100000, 1)).as("n_big"),
        countDistinct(col("o_orderpriority")).as("n_pri"))

  /** As-of join (graft operator — Spark has no native ASOF): for each event,
    * the most recent order date of the matching customer at or before ts. */
  def q10AsOf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"))
    AsOfJoin.asOfBackward(
        left = ev, right = ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payload = Seq("o_orderdate"))
      .select(col("event_id"), unix_timestamp(col("o_orderdate")).as("asof_epoch"))
  }

  /** Range (band) semantics — events within 1 hour after each event, same
    * user — expressed as a range-frame window instead of a self-join. A
    * same-user self-join is quadratic per key (a 10k-event user costs 10^8
    * pairs); the window is one shuffle of |events| with linear per-key work,
    * and returns the identical answer. Range frame is over exact microsecond
    * epochs (unix_micros), not seconds, so the 1-hour boundary matches the
    * join/oracle semantics bit-for-bit. */
  def q11RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(0L, 3600L * 1000 * 1000)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_within_hour", count(lit(1)).over(w))
      .select(col("event_id"), col("n_within_hour"))
  }

  /** JSON extraction from the events.props payload. */
  def q12Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))

  /** Tumbling-window aggregation (batch analogue of the streaming path). */
  def q13TimeWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("bigint")).as("value_cents"))
      .select(unix_timestamp(col("hour")).as("hour_epoch"), col("event_type"),
        col("n"), col("value_cents"))

  /** Sessionization: 30-minute-gap sessions per user via lag + running sum. */
  def q14Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems below 40% of
    * their part's average quantity — Catalyst decorrelates into a join on
    * the group key; written in SQL to exercise the subquery surface. */
  def q16Correlated(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
    s.sql("""SELECT l_partkey, count(*) AS n_small,
            |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
            |FROM graft_lineitem l1
            |WHERE l_quantity < (SELECT 0.4 * avg(l_quantity) FROM graft_lineitem l2
            |                    WHERE l2.l_partkey = l1.l_partkey)
            |GROUP BY l_partkey""".stripMargin)
  }

  /** EXISTS / NOT EXISTS subqueries (decorrelated to semi/anti joins). */
  def q17Exists(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
    s.sql("""SELECT o_orderpriority, count(*) AS n
            |FROM graft_orders o
            |WHERE EXISTS (SELECT 1 FROM graft_lineitem l
            |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
            |  AND NOT EXISTS (SELECT 1 FROM graft_lineitem l
            |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
            |GROUP BY o_orderpriority""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_correlated" -> q16Correlated,
    "q17_exists" -> q17Exists,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_shipping_priority" -> q02ShippingPriority,
    "q03_region_rollup" -> q03RegionRollup,
    "q04_semi_join" -> q04SemiJoin,
    "q05_anti_join" -> q05AntiJoin,
    "q06_latest_order_window" -> q06LatestOrderPerCustomer,
    "q07_rollup" -> q07Rollup,
    "q08_set_ops" -> q08SetOps,
    "q09_distinct_agg" -> q09DistinctAgg,
    "q10_asof_join" -> q10AsOf,
    "q11_range_join" -> q11RangeJoin,
    "q12_json" -> q12Json,
    "q13_time_window" -> q13TimeWindow,
    "q14_sessionize" -> q14Sessionize)

  val oracles: Map[String, String] = Map(
    "q16_correlated" ->
      """SELECT l_partkey, count(*) AS n_small,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.4 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey""".stripMargin,
    "q17_exists" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT) AS sum_disc_bp,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_shipping_priority" ->
      """SELECT o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch, o_orderpriority,
        |  CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_bp
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue_bp DESC, o_orderkey LIMIT 10""".stripMargin,
    "q03_region_rollup" ->
      """SELECT r_name, count(*) AS n_cust,
        |  CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderstatus""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q06_latest_order_window" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS latest_epoch
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q07_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q08_set_ops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT nationkey, 'both' AS tag FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn)
        |UNION ALL
        |SELECT nationkey, 'cust_only' AS tag FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn)
        |UNION ALL
        |SELECT nationkey, 'supp_only' AS tag FROM (SELECT * FROM sn EXCEPT SELECT * FROM cn)""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  count(DISTINCT o_orderpriority) AS n_pri
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q10_asof_join" ->
      """SELECT e.event_id, CAST(epoch(o.o_orderdate) AS BIGINT) AS asof_epoch
        |FROM events e ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "q11_range_join" ->
      """SELECT e.event_id, count(*) AS n_within_hour
        |FROM events e JOIN events w ON e.user_id = w.user_id
        |  AND w.ts >= e.ts AND w.ts <= e.ts + INTERVAL 1 HOUR
        |GROUP BY e.event_id""".stripMargin,
    "q12_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q13_time_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q14_sessionize" ->
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
