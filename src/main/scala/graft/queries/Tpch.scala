package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The full TPC-H Q1–Q22 suite from the reference's own conformance file
  * (/root/reference/tests/sqllogic/sdb/pg/any/tpch/tpch.test, 898 lines —
  * the INTEGER-money variant; its goldens are schema-only because the tables
  * are empty there, so values here gate against the DuckDB oracle on the
  * driver testdata per BASELINE.md).
  *
  * The driver parquet is a REDUCED TPC-H (TESTDATA.md): no `partsupp` and
  * several narrow tables. The missing columns are derived in an
  * augmentation layer of temp views (`tpch_*`, `partsupp`) using ONLY
  * deterministic integer arithmetic over existing keys, rendered once per
  * dialect (Spark SQL / DuckDB SQL) from the same definitions — both
  * engines therefore compute the identical extended dataset, and every
  * query below is single-source text over the augmented views.
  *
  * Determinism rules (the repo's oracle conventions, Relational.scala):
  * money is summed as integer cents (`*_c`) / discount·tax as integer
  * basis points (`*_bp`), so no float accumulation order can diverge;
  * timestamps surface as epoch-second bigints; every LIMIT carries a full
  * tie-break. Quantities are integer-valued doubles, so the few AVG()s
  * (Q17/Q22 thresholds) are exact in IEEE double regardless of order.
  *
  * Scale notes: the augmentation is a per-row projection (no shuffle);
  * `partsupp` is |part|×4 rows built from a broadcast-size cross join.
  * The queries themselves keep TPC-H's join/subquery structure, so
  * Catalyst's broadcast selection, semi/anti-join rewrites of
  * EXISTS/IN, and AQE skew handling apply exactly as they would on a
  * 1000-executor cluster; nothing is collected driver-side.
  */
object Tpch {

  private final case class Dialect(
      str: String => String,          // int → string cast
      dateAdd: (String, String) => String, // DATE expr + int days
      epoch: String => String)        // timestamp/date → epoch seconds

  private val spark = Dialect(
    x => s"CAST($x AS STRING)",
    (d, n) => s"date_add($d, CAST($n AS INT))",
    x => s"CAST(CAST($x AS TIMESTAMP) AS LONG)")

  private val duck = Dialect(
    x => s"CAST($x AS VARCHAR)",
    (d, n) => s"($d + CAST($n AS INT))",
    x => s"CAST(epoch($x) AS BIGINT)")

  /** Augmented relation bodies, shared between dialects. Keys double as the
    * Spark temp-view / DuckDB CTE names. */
  private def aug(d: Dialect): Seq[(String, String)] = Seq(
    "tpch_lineitem" ->
      s"""SELECT l.*,
         |  CAST(round(l_extendedprice * 100) AS BIGINT) AS l_price_c,
         |  CAST(round(l_discount * 100) AS BIGINT) AS l_disc_bp,
         |  CAST(round(l_tax * 100) AS BIGINT) AS l_tax_bp,
         |  CAST(l_quantity AS BIGINT) AS l_qty,
         |  CAST(l_shipdate AS DATE) AS l_sdate,
         |  ${d.dateAdd("CAST(l_shipdate AS DATE)", "((l_orderkey * 31 + l_linenumber * 7) % 60) + 1")} AS l_commitdate,
         |  ${d.dateAdd("CAST(l_shipdate AS DATE)", "((l_orderkey * 17 + l_linenumber * 3) % 45) + 1")} AS l_receiptdate,
         |  CASE (l_orderkey + l_linenumber) % 7
         |    WHEN 0 THEN 'REG AIR' WHEN 1 THEN 'AIR' WHEN 2 THEN 'RAIL'
         |    WHEN 3 THEN 'SHIP' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'MAIL'
         |    ELSE 'FOB' END AS l_shipmode,
         |  CASE (l_orderkey * 3 + l_linenumber) % 4
         |    WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
         |    WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END AS l_shipinstruct
         |FROM lineitem l""".stripMargin,
    "tpch_orders" ->
      s"""SELECT o.*,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS o_total_c,
         |  CAST(0 AS INT) AS o_shippriority,
         |  CASE WHEN o_orderkey % 13 = 0 THEN 'special requests for rush handling'
         |       ELSE 'standard deposits above the counter' END AS o_comment
         |FROM orders o""".stripMargin,
    "tpch_customer" ->
      s"""SELECT c.*,
         |  CAST(round(c_acctbal * 100) AS BIGINT) AS c_acct_c,
         |  ${d.str("10 + c_nationkey")} || '-555-' ||
         |    lpad(${d.str("c_custkey % 10000")}, 4, '0') AS c_phone,
         |  'ADDR_' || ${d.str("c_custkey")} AS c_address,
         |  'customer account ' || ${d.str("c_custkey")} AS c_comment
         |FROM customer c""".stripMargin,
    "tpch_supplier" ->
      s"""SELECT s.*,
         |  CAST(round(s_acctbal * 100) AS BIGINT) AS s_acct_c,
         |  ${d.str("10 + s_nationkey")} || '-555-' ||
         |    lpad(${d.str("s_suppkey % 10000")}, 4, '0') AS s_phone,
         |  'SADDR_' || ${d.str("s_suppkey")} AS s_address,
         |  CASE WHEN s_suppkey % 17 = 0 THEN 'slow Customer service Complaints filed'
         |       ELSE 'dependable supplier with steady output' END AS s_comment
         |FROM supplier s""".stripMargin,
    "tpch_part" ->
      s"""SELECT p.*,
         |  CAST(round(p_retailprice * 100) AS BIGINT) AS p_retail_c,
         |  'Manufacturer#' || ${d.str("(p_partkey % 5) + 1")} AS p_mfgr,
         |  CASE (p_partkey * 7) % 12
         |    WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'SM BOX' WHEN 2 THEN 'SM PACK'
         |    WHEN 3 THEN 'SM PKG' WHEN 4 THEN 'MED BAG' WHEN 5 THEN 'MED BOX'
         |    WHEN 6 THEN 'MED PKG' WHEN 7 THEN 'MED PACK' WHEN 8 THEN 'LG CASE'
         |    WHEN 9 THEN 'LG BOX' WHEN 10 THEN 'LG PACK' ELSE 'LG PKG'
         |  END AS p_container
         |FROM part p""".stripMargin,
    // the classic 4-suppliers-per-part relation; suppkeys are 0-based in the
    // testdata so the modulus lands directly in the key domain
    "partsupp" ->
      """SELECT p_partkey AS ps_partkey,
        |  CAST((p_partkey * 13 + i * 7) % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey,
        |  CAST((p_partkey * 37 + i * 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
        |  CAST((p_partkey * 31 + i * 17) % 99900 + 100 AS BIGINT) AS ps_supplycost_c
        |FROM part CROSS JOIN
        |  (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) reps""".stripMargin)

  private val registered =
    java.util.Collections.synchronizedSet(new java.util.HashSet[(SparkSession, String)]())

  /** Register base tables + augmented views in the session. Memoized per
    * (session, dir): re-registration re-reads 10 parquet footers and
    * re-analyzes 6 view bodies — pure driver overhead that would otherwise
    * be charged to every query in a suite run. Assumes the session's base
    * table views stay bound to `dir` while TPC-H entries run (true for
    * Verify and Bench, which drive one scale dir per pass; the sf1 spot
    * re-registers tables only after the main suite completes). */
  def register(s: SparkSession, dir: String): Unit =
    if (registered.add((s, dir))) {
      Tables.registerAll(s, dir)
      aug(spark).foreach { case (name, body) =>
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS $body")
      }
    }

  /** DuckDB oracle prefix: the same augmentation as CTEs over the driver's
    * registered base views. */
  private val oraclePrefix: String =
    "WITH " + aug(duck).map { case (n, b) => s"$n AS (\n$b)" }.mkString(",\n")

  private val rev = "l_price_c * (100 - l_disc_bp)"

  // Q15's revenue view, inlined at both use sites (a WITH here would
  // collide with the oracle prefix's WITH)
  private val q15rev =
    s"""SELECT l_suppkey AS supplier_no,
       |  CAST(SUM($rev) AS BIGINT) AS total_revenue_cp
       |FROM tpch_lineitem
       |WHERE l_sdate >= DATE '1996-01-01' AND l_sdate < DATE '1996-04-01'
       |GROUP BY l_suppkey""".stripMargin

  private val q22codes = "('12', '14', '17', '20', '23', '29', '31')"

  /** Q1–Q22, single-source text over the augmented views. Faithful to the
    * reference file's structure; constants are tuned to the testdata value
    * domains (nations are NATION_<k>, p_type is a single word, dates span
    * 1995–2001) and money/date outputs follow the oracle conventions. */
  private def queryText(d: Dialect): Map[String, String] = Map(
    // Q1 Pricing Summary Report
    "tpch_q01" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(l_qty) AS BIGINT) AS sum_qty,
         |  CAST(SUM(l_price_c) AS BIGINT) AS sum_base_c,
         |  CAST(SUM($rev) AS BIGINT) AS sum_disc_cp,
         |  CAST(SUM($rev * (100 + l_tax_bp)) AS BIGINT) AS sum_charge_cpp,
         |  CAST(SUM(l_qty) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(SUM(l_price_c) AS DOUBLE) / COUNT(*) AS avg_price_c,
         |  CAST(SUM(l_disc_bp) AS DOUBLE) / COUNT(*) AS avg_disc_bp,
         |  COUNT(*) AS count_order
         |FROM tpch_lineitem
         |WHERE l_sdate <= DATE '2001-08-06'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // Q2 Minimum Cost Supplier
    "tpch_q02" ->
      s"""SELECT s_acct_c, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone, s_comment
         |FROM tpch_part, tpch_supplier, partsupp, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size = 15 AND p_type LIKE '%ECONOMY%'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND ps_supplycost_c = (
         |    SELECT MIN(ps2.ps_supplycost_c)
         |    FROM partsupp ps2, tpch_supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
         |      AND r2.r_name = 'EUROPE')
         |ORDER BY s_acct_c DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,
    // Q3 Shipping Priority
    "tpch_q03" ->
      s"""SELECT l_orderkey,
         |  CAST(SUM($rev) AS BIGINT) AS revenue_cp,
         |  ${d.epoch("o_orderdate")} AS o_odate_epoch, o_shippriority
         |FROM tpch_customer, tpch_orders, tpch_lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < DATE '1998-03-15' AND l_sdate > DATE '1998-03-15'
         |GROUP BY l_orderkey, ${d.epoch("o_orderdate")}, o_shippriority
         |ORDER BY revenue_cp DESC, o_odate_epoch, l_orderkey
         |LIMIT 10""".stripMargin,
    // Q4 Order Priority Checking
    "tpch_q04" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM tpch_orders
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM tpch_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // Q5 Local Supplier Volume
    "tpch_q05" ->
      s"""SELECT n_name, CAST(SUM($rev) AS BIGINT) AS revenue_cp
         |FROM tpch_customer, tpch_orders, tpch_lineitem, tpch_supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue_cp DESC, n_name""".stripMargin,
    // Q6 Forecasting Revenue Change
    "tpch_q06" ->
      """SELECT CAST(SUM(l_price_c * l_disc_bp) AS BIGINT) AS revenue_cb
        |FROM tpch_lineitem
        |WHERE l_sdate >= DATE '1996-01-01' AND l_sdate < DATE '1997-01-01'
        |  AND l_disc_bp BETWEEN 5 AND 7 AND l_qty < 24""".stripMargin,
    // Q7 Volume Shipping
    "tpch_q07" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(volume_cp) AS BIGINT) AS revenue_cp
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_sdate) AS BIGINT) AS l_year, $rev AS volume_cp
         |  FROM tpch_supplier, tpch_lineitem, tpch_orders, tpch_customer,
         |    nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |    AND l_sdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
         |) shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    // Q8 National Market Share
    "tpch_q08" ->
      s"""SELECT o_year,
         |  CAST(SUM(CASE WHEN nation = 'NATION_6' THEN volume_cp ELSE 0 END) AS DOUBLE)
         |    / SUM(volume_cp) AS mkt_share
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $rev AS volume_cp, n2.n_name AS nation
         |  FROM tpch_part, tpch_supplier, tpch_lineitem, tpch_orders, tpch_customer,
         |    nation n1, nation n2, region
         |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
         |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
         |    AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
         |    AND p_type = 'ECONOMY'
         |) all_nations
         |GROUP BY o_year
         |ORDER BY o_year""".stripMargin,
    // Q9 Product Type Profit Measure
    "tpch_q09" ->
      s"""SELECT nation, o_year, CAST(SUM(amount_cp) AS BIGINT) AS sum_profit_cp
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    $rev - ps_supplycost_c * l_qty * 100 AS amount_cp
         |  FROM tpch_part, tpch_supplier, tpch_lineitem, partsupp, tpch_orders, nation
         |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
         |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
         |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%red%'
         |) profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin,
    // Q10 Returned Item Reporting
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, CAST(SUM($rev) AS BIGINT) AS revenue_cp,
         |  c_acct_c, n_name, c_address, c_phone, c_comment
         |FROM tpch_customer, tpch_orders, tpch_lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acct_c, n_name, c_address, c_phone, c_comment
         |ORDER BY revenue_cp DESC, c_custkey
         |LIMIT 20""".stripMargin,
    // Q11 Important Stock Identification
    "tpch_q11" ->
      """SELECT ps_partkey,
        |  CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
        |FROM partsupp, tpch_supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_7'
        |GROUP BY ps_partkey
        |HAVING SUM(ps_supplycost_c * ps_availqty) > (
        |  SELECT SUM(ps_supplycost_c * ps_availqty) * 0.003
        |  FROM partsupp, tpch_supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_7')
        |ORDER BY value_c DESC, ps_partkey""".stripMargin,
    // Q12 Shipping Modes and Order Priority
    "tpch_q12" ->
      """SELECT l_shipmode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM tpch_orders, tpch_lineitem
        |WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL', 'SHIP')
        |  AND l_commitdate < l_receiptdate AND l_sdate < l_commitdate
        |  AND l_receiptdate >= DATE '1996-01-01' AND l_receiptdate < DATE '1997-01-01'
        |GROUP BY l_shipmode
        |ORDER BY l_shipmode""".stripMargin,
    // Q13 Customer Distribution
    "tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey AS ck, COUNT(o_orderkey) AS c_count
        |  FROM tpch_customer LEFT OUTER JOIN tpch_orders
        |    ON c_custkey = o_custkey AND o_comment NOT LIKE '%special%requests%'
        |  GROUP BY c_custkey
        |) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q14 Promotion Effect
    "tpch_q14" ->
      s"""SELECT CAST(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
         |    THEN $rev ELSE 0 END) AS DOUBLE) / SUM($rev) AS promo_revenue
         |FROM tpch_lineitem, tpch_part
         |WHERE l_partkey = p_partkey
         |  AND l_sdate >= DATE '1996-01-01' AND l_sdate < DATE '1996-02-01'""".stripMargin,
    // Q15 Top Supplier (the spec's revenue view, inlined at both uses)
    "tpch_q15" ->
      s"""SELECT s_suppkey, s_name, s_address, s_phone, total_revenue_cp
         |FROM tpch_supplier, ($q15rev) revenue0
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue_cp = (SELECT MAX(total_revenue_cp) FROM ($q15rev) r2)
         |ORDER BY s_suppkey""".stripMargin,
    // Q16 Parts/Supplier Relationship
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp, tpch_part
        |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#12'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM tpch_supplier
        |                         WHERE s_comment LIKE '%Customer%Complaints%')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // Q17 Small-Quantity-Order Revenue
    "tpch_q17" ->
      """SELECT CAST(SUM(l_price_c) AS DOUBLE) / 7.0 AS avg_yearly_c
        |FROM tpch_lineitem, tpch_part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#12'
        |  AND p_container = 'MED BOX'
        |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM tpch_lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    // Q18 Large Volume Customer
    "tpch_q18" ->
      s"""SELECT c_name, c_custkey, o_orderkey,
         |  ${d.epoch("o_orderdate")} AS o_odate_epoch, o_total_c,
         |  CAST(SUM(l_qty) AS BIGINT) AS sum_qty
         |FROM tpch_customer, tpch_orders, tpch_lineitem
         |WHERE o_orderkey IN (SELECT l_orderkey FROM tpch_lineitem
         |                     GROUP BY l_orderkey HAVING SUM(l_qty) > 300)
         |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         |GROUP BY c_name, c_custkey, o_orderkey, ${d.epoch("o_orderdate")}, o_total_c
         |ORDER BY o_total_c DESC, o_odate_epoch, o_orderkey
         |LIMIT 100""".stripMargin,
    // Q19 Discounted Revenue (disjunctive pushdown shape; ranges widened to
    // the testdata's scale so each arm selects rows)
    "tpch_q19" ->
      s"""SELECT CAST(SUM($rev) AS BIGINT) AS revenue_cp
         |FROM tpch_lineitem, tpch_part
         |WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
         |    AND p_container IN ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
         |    AND l_qty BETWEEN 1 AND 30 AND p_size BETWEEN 1 AND 25
         |    AND l_shipmode IN ('AIR', 'REG AIR')
         |    AND l_shipinstruct = 'DELIVER IN PERSON')
         |  OR (p_partkey = l_partkey AND p_brand = 'Brand#22'
         |    AND p_container IN ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
         |    AND l_qty BETWEEN 5 AND 35 AND p_size BETWEEN 1 AND 30
         |    AND l_shipmode IN ('AIR', 'REG AIR')
         |    AND l_shipinstruct = 'DELIVER IN PERSON')
         |  OR (p_partkey = l_partkey AND p_brand = 'Brand#24'
         |    AND p_container IN ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
         |    AND l_qty BETWEEN 10 AND 40 AND p_size BETWEEN 1 AND 35
         |    AND l_shipmode IN ('AIR', 'REG AIR')
         |    AND l_shipinstruct = 'DELIVER IN PERSON')""".stripMargin,
    // Q20 Potential Part Promotion
    "tpch_q20" ->
      """SELECT s_name, s_address
        |FROM tpch_supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (SELECT p_partkey FROM tpch_part
        |                         WHERE p_name LIKE 'red%')
        |      AND ps_availqty > (
        |        SELECT 0.5 * SUM(l_qty) FROM tpch_lineitem
        |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |          AND l_sdate >= DATE '1996-01-01' AND l_sdate < DATE '1997-01-01'))
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_7'
        |ORDER BY s_name""".stripMargin,
    // Q21 Suppliers Who Kept Orders Waiting
    "tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM tpch_supplier, tpch_lineitem l1, tpch_orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
        |  AND EXISTS (SELECT 1 FROM tpch_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM tpch_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_receiptdate > l3.l_commitdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    // Q22 Global Sales Opportunity (the no-orders anti-join is scoped to
    // orders since 2000 — on this dense testdata every customer has SOME
    // order, which would make the spec's literal form empty at every SF)
    "tpch_q22" ->
      s"""SELECT cntrycode, COUNT(*) AS numcust,
         |  CAST(SUM(c_acct_c) AS BIGINT) AS totacctbal_c
         |FROM (
         |  SELECT substring(c_phone, 1, 2) AS cntrycode, c_acct_c, c_custkey AS ck
         |  FROM tpch_customer
         |  WHERE substring(c_phone, 1, 2) IN $q22codes
         |    AND c_acct_c > (SELECT AVG(c_acct_c) FROM tpch_customer
         |                    WHERE c_acct_c > 0
         |                      AND substring(c_phone, 1, 2) IN $q22codes)
         |) custsale
         |WHERE NOT EXISTS (SELECT 1 FROM tpch_orders
         |                  WHERE o_custkey = ck
         |                    AND o_orderdate >= DATE '2000-01-01')
         |GROUP BY cntrycode
         |ORDER BY cntrycode""".stripMargin)

  val all: Map[String, (SparkSession, String) => DataFrame] =
    queryText(spark).map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => { register(s, dir); s.sql(sql) })
    }

  val oracles: Map[String, String] =
    queryText(duck).map { case (name, sql) => name -> s"$oraclePrefix\n$sql" }
}
