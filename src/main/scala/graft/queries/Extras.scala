package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Geo, GeoGeom, Inet, Sequences}

/** Coverage for the remaining SURVEY §2 rows that are cheap in Spark but
  * must be proven, not assumed: approximate sketches (with quality gates),
  * CSV/JSON read+write round-trip, blockwise-NL/cross joins, sequences,
  * geo scalars, and a deterministic ai_embed stand-in.
  */
object Extras {

  /** approx_count_distinct (HLL++) and percentile_approx are sketches —
    * their exact outputs are engine-specific, so the entry emits QUALITY
    * GATES (the vec_ivf_recall pattern): each boolean turns red if the
    * sketch drifts outside tolerance vs the exact answer. */
  def approxSketches(s: SparkSession, dir: String): DataFrame = {
    // two independent single-aggregate scans (each pruned to one column)
    // beat one combined Aggregate, whose count-distinct Expand would
    // multiply the rows flowing through the percentile buffers; the exact
    // percentile exists only to GATE the sketch (test-scale check)
    val cd = Tables.lineitem(s, dir).agg(
      countDistinct(col("l_partkey")).as("exact_cd"),
      approx_count_distinct(col("l_partkey")).as("approx_cd"))
    val pq = Tables.lineitem(s, dir).agg(
      expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50a"),
      expr("percentile(l_extendedprice, array(0.45, 0.55))").as("pb"))
    cd.crossJoin(pq).select(
      (abs(col("approx_cd") - col("exact_cd")).cast("double") /
        col("exact_cd").cast("double") <= 0.05).as("acd_ok"),
      col("p50a").between(col("pb")(0), col("pb")(1)).as("pq_ok"))
  }

  /** COPY-path round-trip: write nation as CSV and JSON, read both back,
    * join on the key and aggregate — proves both readers and writers
    * (SURVEY §2.1 file formats beyond parquet). */
  def fmtRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = sys.props("java.io.tmpdir") +
      "/graft-fmt-" + dir.replaceAll("[^A-Za-z0-9._-]+", "_")
    val n = Tables.nation(s, dir)
    n.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    n.write.mode("overwrite").json(s"$tmp/nation_json")
    val c = s.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_regionkey").cast("long").as("n_regionkey"))
    val j = s.read.json(s"$tmp/nation_json")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"))
    c.join(j, "n_nationkey")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_name"))
  }

  /** Blockwise nested-loop join (non-equi): supplier balance dominance pairs.
    * Catalyst plans BroadcastNestedLoopJoin — the reference's
    * BLOCKWISE_NL_JOIN (EXPLAIN in file_tables.test:36-40). */
  def q15CrossNl(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.supplier(s, dir).select(col("s_acctbal").as("bal_a"))
    val b = Tables.supplier(s, dir).select(col("s_acctbal").as("bal_b"))
    a.join(b, col("bal_a") > col("bal_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Sequence assignment: block-allocated dense ids over an ordering —
    * nextval semantics for batch engines (sequence.cpp:84-132). The sequence
    * is reset first so the entry is deterministic under re-runs. */
  def seqAssign(s: SparkSession, dir: String): DataFrame = {
    val seqPath = sys.props("java.io.tmpdir") +
      "/graft-seq-" + dir.replaceAll("[^A-Za-z0-9._-]+", "_")
    Sequences.setval(s, seqPath, 0L)
    Sequences.assignIds(Tables.nation(s, dir), seqPath, "seq_id", Seq("n_nationkey"))
      .select(col("n_nationkey"), col("seq_id"))
  }

  /** Geo scalar surface: WKT make/parse + haversine distance, nearest-10
    * customers to the origin on synthetic lon/lat derived from keys. */
  def geoKnn(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
      .withColumn("wkt", Geo.stPoint(col("lon"), col("lat")))
    c.withColumn("dist_km",
        Geo.stDistanceSphereKm(Geo.stX(col("wkt")), Geo.stY(col("wkt")),
          lit(0.0), lit(0.0)))
      .orderBy(col("dist_km"), col("c_custkey"))
      .limit(10)
      .select(col("c_custkey"), round(col("dist_km")).cast("bigint").as("km_q"))
  }

  /** Indexed geohash precision for the customer-points fixture: tokens are
    * stored at this FIXED fine precision; coverings at coarser precisions
    * read the index through prefix term-ranges (a coarse cell is a string
    * prefix of every finer cell inside it). */
  private val GeoIdxPrecision = 4

  private def geoPointsIndex(s: SparkSession, dir: String,
      pts: DataFrame): graft.index.InvertedIndex = {
    val ghUdf = udf((lat: Double, lon: Double) =>
      Geo.geohash(lat, lon, GeoIdxPrecision))
    graft.index.IndexStore.ensure(s,
      pts.withColumn("gh", ghUdf(col("lat"), col("lon"))),
      s"$dir-customer-geo$GeoIdxPrecision", "c_custkey", "gh", "keyword",
      withPositions = false)
  }

  /** In-index geo search: customer points are indexed as geohash cell
    * tokens (keyword terms — the S2-covering-cell pattern,
    * geo_filter_builder.cpp:599-661); a bbox query computes an ADAPTIVE
    * mixed-precision covering (coarse cells where fully inside, refined at
    * the boundary, target precision derived from the box size — the
    * S2-covering analogue), looks the cells up as pushable term-range
    * prefix reads, then refines candidates with the exact containment
    * predicate. Result equals the direct filter for ANY covering superset. */
  def geoCellSearch(s: SparkSession, dir: String): DataFrame = {
    def pts = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    val idx = geoPointsIndex(s, dir, pts)
    val (minLon, minLat, maxLon, maxLat) = (-60.0, -30.0, 60.0, 30.0)
    val cover = Geo.adaptiveCoverBox(minLon, minLat, maxLon, maxLat, GeoIdxPrecision)
    val candidates = idx.anyOfPrefixes(cover)
      .withColumnRenamed("doc_id", "c_custkey")
    pts.join(candidates, "c_custkey")
      .filter(Geo.stContainsBox(lit(minLon), lit(minLat), lit(maxLon), lit(maxLat),
        col("lon"), col("lat")))
      .select(col("c_custkey"))
  }

  /** The demo pentagon, shared by the polygon entries and their oracles. */
  private val polyWkt =
    "POLYGON((0 40, 38 12, 24 -32, -24 -32, -38 12, 0 40))"

  /** ST_Contains(polygon, point) by even-odd ray casting over a WKT
    * polygon (reference libs/geo/wkb.cpp WKT surface, geometry_wkt.test):
    * the constant polygon becomes a literal vertex array (driver-parsed —
    * see Geo.polygonLit for why not the expression parse), each point
    * tests 5 half-plane crossings — codegen'd, no UDF. The oracle repeats
    * the same crossing arithmetic term-for-term. */
  def geoPolygonContains(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    pts.filter(Geo.stContainsPolygon(
        Geo.polygonLit(polyWkt), col("lon"), col("lat")))
      .select(col("c_custkey"))
  }

  /** The polygon query THROUGH the geohash cell index: an adaptive covering
    * of the polygon itself (not just its envelope — cells outside the
    * polygon but inside the envelope are pruned) → prefix term-range
    * lookups → exact point-in-polygon refine (+ an envelope
    * bbox-intersects sanity guard). Equal to geo_polygon_contains for any
    * covering superset — the same invariant geo_cell_search establishes
    * for boxes. */
  def geoPolygonCells(s: SparkSession, dir: String): DataFrame = {
    def pts = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    val idx = geoPointsIndex(s, dir, pts)
    val candidates = idx.anyOfPrefixes(
        Geo.adaptiveCoverPolygon(polyWkt, GeoIdxPrecision))
      .withColumnRenamed("doc_id", "c_custkey")
    val verts = Geo.polygonLit(polyWkt)
    pts.join(candidates, "c_custkey")
      .filter(Geo.stIntersectsBox(verts, col("lon"), col("lat"), col("lon"), col("lat")))
      .filter(Geo.stContainsPolygon(verts, col("lon"), col("lat")))
      .select(col("c_custkey"))
  }

  /** ST_Contains(bbox, point) count. */
  def geoBbox(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    c.filter(Geo.stContainsBox(lit(-60.0), lit(-30.0), lit(60.0), lit(30.0),
        col("lon"), col("lat")))
      .agg(count(lit(1)).as("n_inside"))
  }

  /** WKB round-trip over the scan: encode each point to OGC WKB with the
    * native st_aswkb expression, decode lon/lat back with st_wkb_x/_y — all
    * three inside whole-stage codegen (no UDF in the binary path; golden
    * byte-layout and big-endian decode are asserted in GeoSpec). */
  def geoWkbRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    pts.withColumn("wkb", Geo.stAsWkb(col("lon"), col("lat")))
      .select(col("c_custkey"),
        Geo.stWkbX(col("wkb")).as("lon"), Geo.stWkbY(col("wkb")).as("lat"))
  }

  /** Full-breadth WKT↔WKB round-trip (libs/geo/wkb.cpp types 1-7):
    * LineString / MultiPoint / MultiLineString / MultiPolygon-with-hole /
    * GeometryCollection each parse, encode to OGC WKB, decode, and render
    * back to the identical canonical WKT — inside codegen via the
    * st_geomfromtext/st_astext expressions. */
  def geoWkbKinds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val shapes = Seq(
      ("point", "POINT(30 10)"),
      ("linestring", "LINESTRING(30 10, 10 30, 40 40)"),
      ("polygon", "POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))"),
      ("polygon_hole",
        "POLYGON((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))"),
      ("multipoint", "MULTIPOINT((10 40), (40 30), (20 20), (30 10))"),
      ("multilinestring",
        "MULTILINESTRING((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))"),
      ("multipolygon",
        "MULTIPOLYGON(((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))"),
      ("collection",
        "GEOMETRYCOLLECTION(POINT(40 10), LINESTRING(10 10, 20 20, 10 40))"))
    shapes.toDF("kind", "wkt")
      .select(col("kind"),
        (call_function("st_astext",
          call_function("st_geomfromtext", col("wkt"))) === col("wkt")).as("ok"))
      .orderBy(col("kind"))
  }

  /** Point-in-MULTIPOLYGON with a hole: two disjoint shells, the first
    * carrying a hole — the even-odd test runs per ring inside codegen
    * (st_contains_geom with a plan-time WKB literal), shell-minus-holes
    * semantics exactly as the oracle's per-ring crossing counts. */
  def geoMultipolygonContains(s: SparkSession, dir: String): DataFrame = {
    val mp = "MULTIPOLYGON(((-60 -30, 0 -30, 0 30, -60 30, -60 -30), " +
      "(-40 -10, -20 -10, -20 10, -40 10, -40 -10)), " +
      "((20 -20, 60 -20, 60 20, 20 20, 20 -20)))"
    val wkb = lit(GeoGeom.toWkb(GeoGeom.parseWkt(mp)))
    val pts = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    pts.filter(call_function("st_contains_geom", wkb, col("lon"), col("lat")))
      .select(col("c_custkey"))
  }

  /** ST_Distance_Between (search.cpp:222, kGeoInRange): customers whose
    * haversine distance to the query centroid lies in [3000, 8000) km
    * (3e6-8e6 METRES — the reference's centroid-distance unit,
    * geo_search.test:238) — the annulus predicate composes into plain
    * range comparisons over st_distance_centroid, so Catalyst sees
    * ordinary filters. */
  def geoDistanceBetween(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    pts.filter(call_function("st_distance_between",
        call_function("st_aswkb", col("lon"), col("lat")),
        call_function("st_geomfromtext", lit("POINT(0 0)")),
        lit(3.0e6), lit(8.0e6), lit(true), lit(false)))
      .select(col("c_custkey"))
  }

  /** GeoJSON surface: each point serialized to a GeoJSON Point and parsed
    * back (to_json/from_json — runtime column ops over real per-row data);
    * the query polygon arrives as a GeoJSON constant and is driver-parsed to
    * a vertex-array LITERAL (geoJsonPolygonLit — an aliased from_json gets
    * substituted into the containment lambda by projection collapse and
    * would re-parse per edge per row), then the same even-odd containment
    * runs. Result is identical to geo_polygon_contains. */
  def geoGeoJson(s: SparkSession, dir: String): DataFrame = {
    val gjPolygon =
      """{"type":"Polygon","coordinates":
        |[[[0,40],[38,12],[24,-32],[-24,-32],[-38,12],[0,40]]]}""".stripMargin.replace("\n", "")
    val pts = Tables.customer(s, dir)
      .withColumn("lon", (col("c_custkey") % 360 - 180).cast("double") + 0.5)
      .withColumn("lat", (col("c_custkey") * 7 % 170 - 85).cast("double") + 0.5)
    pts.withColumn("gj", Geo.asGeoJsonPoint(col("lon"), col("lat")))
      .withColumn("p", Geo.geoJsonPoint(col("gj")))
      .filter(Geo.stContainsPolygon(Geo.geoJsonPolygonLit(gjPolygon),
        col("p").getField("x"), col("p").getField("y")))
      .select(col("c_custkey"))
  }

  /** ai_embed (reference embedding.cpp:160-201 + provider_openai.cpp): the
    * provider layer is real — set `spark.graft.ai.endpoint` and executors
    * batch-POST the OpenAI embeddings protocol (AiEmbed.withEmbedding,
    * exercised against a live in-process server in AiEmbedSpec). Unset (as
    * in this container — no egress), the deterministic md5 stub supplies
    * component k of dim 8 = bytes 2k..2k+1 of md5(text) scaled to [0,1). */
  def aiEmbed(s: SparkSession, dir: String): DataFrame = {
    val emb = graft.functions.AiEmbed.withEmbedding(
      Tables.documents(s, dir).filter(col("doc_id") < 20).select("doc_id", "text"),
      "text", "emb", endpoint = s.conf.get("spark.graft.ai.endpoint", ""))
    emb.select(col("doc_id") +: (0 until 8).map(k =>
      round(col("emb")(k) * 10000).cast("bigint").as(s"e${k}_q")): _*)
  }

  /** pg-compat scalar pack (string.cpp/math.cpp gap-fillers, SURVEY §2.8):
    * gcd/lcm as registered scalar UDFs, octet_length / hex / translate /
    * width_bucket native. */
  def strMathPack(s: SparkSession, dir: String): DataFrame = {
    s.udf.register("gcd_u", (a: Long, b: Long) => BigInt(a).gcd(BigInt(b)).toLong)
    s.udf.register("lcm_u", (a: Long, b: Long) =>
      if (a == 0 || b == 0) 0L else a / BigInt(a).gcd(BigInt(b)).toLong * b)
    Tables.part(s, dir).select(
      col("p_partkey"),
      expr("gcd_u(p_partkey, 24)").as("gcd24"),
      expr("lcm_u(p_partkey % 7 + 1, 6)").as("lcm6"),
      octet_length(col("p_name")).cast("bigint").as("name_bytes"),
      lower(hex(col("p_partkey"))).as("key_hex"),
      translate(col("p_type"), "AEIOU", "aeiou").as("type_tr"),
      width_bucket(col("p_size").cast("double"), lit(0.0), lit(50.0), lit(5))
        .cast("bigint").as("size_bucket"))
  }

  /** SQL macros (macro_json_arrow.test analogue): a SQL-bodied temporary
    * function substitutes at analysis time — stays codegen'd. */
  def sqlMacro(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("graft_events")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION j_get(j STRING, k STRING)
            |RETURNS STRING RETURN get_json_object(j, concat('$.', k))""".stripMargin)
    s.sql("""SELECT event_type, count(*) AS n,
            |  sum(CAST(j_get(props, 'k') AS BIGINT)) AS sum_k
            |FROM graft_events GROUP BY event_type""".stripMargin)
  }

  /** VARIANT type (SURVEY §1.2 — the reference's `::json::variant`,
    * variant.test:1-30): parse once to the binary variant encoding, extract
    * typed fields with variant_get — Spark 4's native semi-structured path,
    * faster than repeated string JSON parsing. */
  def jsonVariant(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.tag', 'string')").as("tag"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        count_distinct(col("tag")).as("n_tags"))

  /** The remaining math.cpp gap-fillers (MathExt): erf/erfc/cotd as
    * codegen'd expression compositions over a deterministic grid, integer
    * div, and make_timestamp (Spark built-in, UTC session) — all mirrored
    * term-for-term in the oracle. */
  def mathExtPack(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MathExt
    val grid = Tables.documents(s, dir).filter(col("doc_id") < 21)
      .select(col("doc_id"),
        ((col("doc_id") - 10).cast("double") / 4.0).as("x"),
        (col("doc_id") * 7 + 1).cast("double").as("deg"))
    grid.select(
      col("doc_id"),
      round(MathExt.erf(col("x")) * 10000).cast("bigint").as("erf_q"),
      round(MathExt.erfc(col("x")) * 10000).cast("bigint").as("erfc_q"),
      round(MathExt.cotd(col("deg")) * 10000).cast("bigint").as("cotd_q"),
      expr("doc_id div 3").as("div3"),
      unix_timestamp(expr(
        "make_timestamp(2026, 3, CAST(doc_id % 27 + 1 AS INT), 12, 30, 0)"))
        .as("mk_ts_epoch"))
  }

  /** PG date_bin: 15-minute buckets of the event stream, aligned to the
    * epoch — pure integer arithmetic, so the bin ids hash-match exactly. */
  def q19DateBin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MathExt
    Tables.events(s, dir)
      .withColumn("bin", MathExt.dateBinEpoch(900L, col("ts"), 0L))
      .groupBy(col("bin"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The reference's string.cpp surface beyond str_math_pack (initcap,
    * base64 encode/decode, string_to_array, to_bin, format,
    * regexp_match) — Spark built-ins end to end; the oracle mirrors each
    * with DuckDB's equivalent spelling. */
  def strPack2(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      initcap(col("p_name")).as("name_cap"),
      base64(encode(col("p_brand"), "UTF-8")).as("brand_b64"),
      decode(unbase64(base64(encode(col("p_type"), "UTF-8"))), "UTF-8").as("type_rt"),
      size(split(col("p_name"), " ")).cast("bigint").as("n_words"),
      bin(col("p_partkey")).as("key_bin"),
      format_string("%s#%d", col("p_brand"), col("p_size")).as("tag"),
      regexp_extract(col("p_type"), "[A-Z]+", 0).as("first_caps"))

  /** The pg inet function surface (reference: vendored duckdb_inet,
    * inet.test) over synthetic-but-deterministic addresses derived from
    * events.user_id — host/masklen/network/broadcast/set_masklen/family and
    * `<<=` containment, all pure built-in-expression compositions
    * (functions/Inet.scala — codegen'd, no UDF). */
  def inetPack(s: SparkSession, dir: String): DataFrame = {
    val u = col("user_id")
    val ip = concat_ws("/",
      concat_ws(".", u % 223 + 1, (u * 7) % 256, (u * 13) % 256, (u * 29) % 256),
      (u % 25) + 8)
    Tables.events(s, dir)
      .filter(col("event_id") < 500)
      .select(col("event_id"), ip.as("ip"))
      .select(col("event_id"), col("ip"),
        Inet.inetHost(col("ip")).as("host"),
        Inet.inetMasklen(col("ip")).as("mlen"),
        Inet.inetFamily(col("ip")).as("fam"),
        Inet.inetNetwork(col("ip")).as("network"),
        Inet.inetBroadcast(col("ip")).as("bcast"),
        Inet.inetSetMasklen(col("ip"), 16).as("m16"),
        Inet.inetContainedBy(col("ip"), lit("128.0.0.0/1")).as("in_upper"))
  }

  /** The remaining pg-compat string layer (reference string.cpp:1170-1391,
    * system.cpp num_nulls/num_nonnulls, split_by_non_alpha.cpp): byte/bit
    * accessors, quoting, null counters, regexp_instr, and the non-alpha
    * tokenizer — all built-in expression compositions over ASCII part
    * names, so the byte-level accessors (pg operates on the UTF-8 bytes)
    * coincide with character math in both engines. */
  def strPack3(s: SparkSession, dir: String): DataFrame = {
    val t = concat(col("p_name"), lit("-"), col("p_partkey"))
    // inject the quote chars so the escaping actually fires
    val qsrc = translate(col("p_name"), "a", "\"")
    val lsrc = translate(col("p_name"), "e", "'")
    val qi = concat(lit("\""), regexp_replace(qsrc, "\"", "\"\""), lit("\""))
    val ql = concat(lit("'"), regexp_replace(lsrc, "'", "''"), lit("'"))
    val b1 = ascii(substring(col("p_name"), 2, 1)) // get_byte(name, 1) — ASCII
    // get_bit(name, 12) = bit 4 (LSB-first) of byte 1
    val bit12 = expr("(ascii(substring(p_name, 2, 1)) div 16) % 2")
    val sb = concat(substring(col("p_name"), 1, 1), lit("Z"),
      expr("substring(p_name, 3)")) // set_byte(name, 1, 'Z')
    val nullable = when(col("p_partkey") % 3 === 0, lsrc)
    val nn = when(nullable.isNull, 1).otherwise(0)
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        qi.as("qident"), ql.as("qlit"),
        // quote_nullable: quote_literal(v) or the literal string NULL
        coalesce(concat(lit("'"), regexp_replace(nullable, "'", "''"), lit("'")),
          lit("NULL")).as("qnullable"),
        b1.as("b1"), bit12.cast("int").as("bit12"), sb.as("sb"),
        nn.cast("int").as("n_nulls"), (lit(2) - nn).cast("int").as("n_nonnulls"),
        regexp_instr(t, lit("[0-9]+")).cast("int").as("digit_pos"),
        concat_ws("|", filter(split(t, "[^A-Za-z]+"), x => x =!= "")).as("alpha_toks"))
  }

  /** Temporal surface (reference pg/simple/temporal tests, at_keyword.test):
    * week/quarter truncation, month arithmetic with end-of-month clamping,
    * ISO day-of-week, last_day/make_date, and AT TIME ZONE against a
    * FIXED-OFFSET zone (Asia/Kolkata, +5:30, no DST — keeps the wall-clock
    * shift engine-provable as epoch+19800). Everything emits epochs/dates,
    * the hash-stable forms. */
  def temporalPack(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 2000)
      .select(col("event_id"),
        unix_timestamp(date_trunc("week", col("ts"))).as("week_start"),
        unix_timestamp(date_trunc("quarter", col("ts"))).as("quarter_start"),
        add_months(to_date(col("ts")), 2).as("plus_2m"),
        (weekday(col("ts")) + 1).as("isodow"),
        last_day(to_date(col("ts"))).as("month_end"),
        unix_timestamp(from_utc_timestamp(col("ts"), "Asia/Kolkata"))
          .as("kolkata_wall_epoch"),
        make_date(year(col("ts")), month(col("ts")), lit(1)).as("month_start"))

  /** SUMMARIZE parity (summarize_all_types.test): profile seven lineitem
    * columns — exact distinct + median over canonical integer units instead
    * of the reference's sketches, so the profile hash-matches any engine.
    * See [[graft.operators.Summarize]] for the melt-once 100 TB shape. */
  def summarizeTable(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Summarize, Summarize.ColSpec
    Summarize.summarize(Tables.lineitem(s, dir), Seq(
      ColSpec("l_orderkey", "int", "bigint"),
      ColSpec("l_linenumber", "int", "int"),
      ColSpec("l_quantity", "cents", "double"),
      ColSpec("l_extendedprice", "cents", "double"),
      ColSpec("l_returnflag", "string", "string"),
      ColSpec("l_linestatus", "string", "string"),
      ColSpec("l_shipdate", "epoch", "timestamp")))
  }

  /** Window-function surface beyond the ranking/frames already green in
    * q06/q14 (reference window.test): lag/lead, ntile, nth_value,
    * percent_rank/cume_dist, and a RANGE frame over event-time seconds
    * (30-day trailing sum). Money is cents BIGINT so every aggregate is
    * exact; the in-partition order is made total with the unique orderkey
    * tiebreak so offset functions are deterministic. */
  def windowPack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val w30 = Window.partitionBy(col("o_custkey"))
      .orderBy(col("ep"))
      .rangeBetween(-2592000L, 0L)
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 5000)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("ep", unix_timestamp(col("o_orderdate")))
      .select(
        col("o_orderkey"),
        lag(col("cents"), 1).over(w).as("prev_cents"),
        lead(col("cents"), 1).over(w).as("next_cents"),
        ntile(4).over(w).cast("long").as("quartile"),
        nth_value(col("cents"), 2).over(w).as("second_cents"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        sum(col("cents")).over(w30).as("cents_30d"))
  }

  /** List/array function surface (reference array_cast_dialects.test +
    * DuckDB list_* builtins): size, membership, 1-based position (0 when
    * absent in both engines), slicing,
    * sort, distinct, a fold (total token length), and list max — all over
    * split p_name token lists, codegen'd builtins end to end. */
  def arrayPack(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 2000)
      .withColumn("toks", split(col("p_name"), " "))
      .select(
        col("p_partkey"),
        size(col("toks")).cast("long").as("n_toks"),
        array_contains(col("toks"), "red").as("has_red"),
        // both engines return 0 for "absent" (pg index convention)
        array_position(col("toks"), "red").as("red_pos"),
        concat_ws("-", slice(col("toks"), 1, 2)).as("first2"),
        concat_ws("-", sort_array(col("toks"))).as("sorted_toks"),
        concat_ws("-", array_sort(array_distinct(col("toks")))).as("dedup_toks"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x)).as("total_len"),
        array_max(col("toks")).as("max_tok"))

  /** Temporal aggregate surface (temporal/temporal_aggregates.test): the
    * reference's point is that avg over extended-precision timestamps stays
    * EXACT (hugeint accumulation, no double round-trip). Mirrored here over
    * the raw TIMESTAMP(NANOS) events column read as a nanos long: the sum
    * accumulates in DECIMAL(38,0) (a µs-epoch sum at sf0.1 is ~3e17 — past
    * double's 2^53 — so a float path would visibly drift) and the floor
    * average is rendered as a string so Spark DECIMAL and DuckDB HUGEINT
    * hash identically. µs precision because DuckDB's parquet reader
    * truncates ns→µs; Spark keeps the ns long and truncates the same way. */
  def temporalAgg(s: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.adopt(s)
    // Normalize ts to TimestampType whatever the file's physical encoding
    // (nanos-long or timestamp[us] — Tables.normalizeTs branches on the
    // loaded type), then take exact epoch micros.
    Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("us")).as("min_us"),
        max(col("us")).as("max_us"),
        expr("CAST(FLOOR(sum(CAST(us AS DECIMAL(38,0))) / count(*)) AS STRING)")
          .as("avg_us"),
        expr("CAST(sum(us DIV 1000000) DIV count(*) AS BIGINT)").as("avg_s"))
  }

  /** SQL-dialect sugar the reference's DuckDB layer accepts and Spark 4
    * also parses natively — proven as TEXT, not DataFrame calls, so the
    * user-facing SQL surface is what's exercised: GROUP BY ALL (groupby
    * .test), PIVOT to a wide layout, and per-group window ranking (the
    * DuckDB side says QUALIFY; Spark has no QUALIFY, so its text uses the
    * standard ranked-subquery — same semantics, both dialects' idiom).
    * One entry, three statements joined on the group key. */
  def sqlDialect(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
    s.sql("""SELECT * FROM (
            |  SELECT o_orderpriority,
            |    count(*) AS n,
            |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            |  FROM graft_orders WHERE o_orderkey < 20000 GROUP BY ALL)
            |JOIN (
            |  SELECT o_orderpriority, top_cents, top_key FROM (
            |    SELECT o_orderpriority,
            |      CAST(round(o_totalprice * 100) AS BIGINT) AS top_cents,
            |      o_orderkey AS top_key,
            |      row_number() OVER (PARTITION BY o_orderpriority
            |        ORDER BY o_totalprice DESC, o_orderkey) AS rn
            |    FROM graft_orders WHERE o_orderkey < 20000)
            |  WHERE rn = 1)
            |USING (o_orderpriority)
            |JOIN (
            |  SELECT * FROM (
            |    SELECT o_orderpriority, o_orderstatus
            |    FROM graft_orders WHERE o_orderkey < 20000)
            |  PIVOT (count(*) FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)))
            |USING (o_orderpriority)""".stripMargin)
  }

  /** pg SUBSTRING window-clamp conformance (pg/simple/substring.test):
    * zero/negative starts clamp into the length. Neither engine does this
    * natively (Spark: 0→1; DuckDB: negative→from-the-end), so both sides
    * compute the documented pg window [from, from+len) ∩ [1, ∞) — Spark via
    * [[graft.functions.PgCompat.pgSubstring]], DuckDB via the same formula
    * in SQL; goldens vs the reference test outputs live in PgCompatSpec. */
  def strSubstrPg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PgCompat.pgSubstring
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 2000)
      .withColumn("f", (lit(2) - pmod(col("p_size"), lit(6))).cast("int"))
      .select(col("p_partkey"),
        pgSubstring(col("p_name"), col("f"), lit(5)).as("sub_var"),
        pgSubstring(col("p_name"), lit(0), lit(5)).as("sub_zero"),
        pgSubstring(col("p_name"), lit(-3), lit(5)).as("sub_neg"),
        substring(col("p_name"), 2, 5).as("sub_plain"))
  }

  /** pg array TEXT rendering parity (pg/any/conformance/arrays.test): what
    * a pg wire client sees for an array value — quote/escape/NULL rules in
    * [[graft.functions.PgCompat.pgArrayText]]; the oracle re-implements the
    * same documented rules in DuckDB SQL and PgCompatSpec pins the
    * reference goldens. One array mixes a spaced string (always quoted), a
    * bare token, and a SQL NULL (renders bare NULL). */
  def pgArrayRender(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PgCompat.pgArrayText
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 2000)
      .select(col("p_partkey"),
        pgArrayText(array(col("p_name"), col("p_brand"),
          nullif(col("p_type"), lit("PROMO")))).as("arr_txt"),
        pgArrayText(split(col("p_name"), " ")).as("toks_txt"))
  }

  /** pg boolean text conformance (pg/simple/boolean.test): parse the full
    * prefix-form input surface (t/tr/y/on/1/…, of/off/n/0/…, junk → NULL)
    * and render pg's 't'/'f' wire text. Each row exercises one form picked
    * deterministically by key; rules live in PgCompat, goldens in
    * PgCompatSpec, and the oracle re-states the documented rule in SQL. */
  def pgBoolText(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PgCompat
    val forms = Seq("t", "TRUE", "yes", "on", "1", "f", "False", "no",
      "off", "0", "tr", "N", " true ", "junk", "o", "of")
    val raw = element_at(
      array(forms.map(lit): _*), (pmod(col("p_partkey"), lit(16)) + 1).cast("int"))
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 2000)
      .select(col("p_partkey"), raw.as("raw"),
        PgCompat.pgBoolParse(raw).as("parsed"),
        PgCompat.pgBoolText(PgCompat.pgBoolParse(raw)).as("rendered"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pg_bool_text" -> pgBoolText,
    "pg_array_render" -> pgArrayRender,
    "str_substr_pg" -> strSubstrPg,
    "sql_dialect" -> sqlDialect,
    "temporal_agg" -> temporalAgg,
    "window_pack" -> windowPack,
    "array_pack" -> arrayPack,
    "summarize_table" -> summarizeTable,
    "temporal_pack" -> temporalPack,
    "inet_pack" -> inetPack,
    "str_pack3" -> strPack3,
    "str_pack2" -> strPack2,
    "math_ext_pack" -> mathExtPack,
    "q19_date_bin" -> q19DateBin,
    "json_variant" -> jsonVariant,
    "str_math_pack" -> strMathPack,
    "sql_macro" -> sqlMacro,
    "approx_sketches" -> approxSketches,
    "fmt_roundtrip" -> fmtRoundtrip,
    "q15_cross_nl" -> q15CrossNl,
    "seq_assign" -> seqAssign,
    "geo_knn" -> geoKnn,
    "geo_bbox" -> geoBbox,
    "geo_cell_search" -> geoCellSearch,
    "geo_polygon_contains" -> geoPolygonContains,
    "geo_polygon_cells" -> geoPolygonCells,
    "geo_wkb_roundtrip" -> geoWkbRoundtrip,
    "geo_wkb_kinds" -> geoWkbKinds,
    "geo_multipolygon_contains" -> geoMultipolygonContains,
    "geo_distance_between" -> geoDistanceBetween,
    "geo_geojson" -> geoGeoJson,
    "ai_embed" -> aiEmbed)

  // ---- oracles -------------------------------------------------------------

  private val lonLat =
    """pts AS (SELECT c_custkey,
      |  CAST(c_custkey % 360 - 180 AS DOUBLE) + 0.5 AS lon,
      |  CAST(c_custkey * 7 % 170 - 85 AS DOUBLE) + 0.5 AS lat
      |FROM customer)""".stripMargin

  /** Even-odd ray casting with the SAME half-plane arithmetic order as
    * Geo.stContainsPolygon — `(x2-x1)*(lat-y1)/(y2-y1)+x1` — so both
    * engines make identical IEEE decisions at every edge. */
  private val polygonOracle =
    s"""WITH $lonLat,
       |edges(x1, y1, x2, y2) AS (VALUES
       |  (0.0, 40.0, 38.0, 12.0), (38.0, 12.0, 24.0, -32.0),
       |  (24.0, -32.0, -24.0, -32.0), (-24.0, -32.0, -38.0, 12.0),
       |  (-38.0, 12.0, 0.0, 40.0)),
       |cr AS (SELECT c_custkey, count(*) AS crossings
       |       FROM pts, edges
       |       WHERE ((y1 > lat) <> (y2 > lat))
       |         AND lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
       |       GROUP BY c_custkey)
       |SELECT c_custkey FROM cr WHERE crossings % 2 = 1""".stripMargin

  private val haversine =
    """2.0 * 6371.0088 * asin(sqrt(
      |  sin(radians(0.0 - lat) / 2.0) * sin(radians(0.0 - lat) / 2.0)
      |  + cos(radians(lat)) * cos(radians(0.0))
      |    * sin(radians(0.0 - lon) / 2.0) * sin(radians(0.0 - lon) / 2.0)))""".stripMargin

  val oracles: Map[String, String] = Map(
    "pg_bool_text" ->
      """WITH p AS (SELECT p_partkey,
        |    (['t','TRUE','yes','on','1','f','False','no',
        |      'off','0','tr','N',' true ','junk','o','of'])[(p_partkey % 16) + 1]
        |      AS raw
        |  FROM part WHERE p_partkey <= 2000),
        |v AS (SELECT p_partkey, raw, lower(trim(raw)) AS t FROM p),
        |b AS (SELECT p_partkey, raw,
        |    CASE WHEN length(t) >= 1 AND (starts_with('true', t)
        |           OR starts_with('yes', t) OR t = 'on' OR t = '1') THEN true
        |         WHEN length(t) >= 1 AND (starts_with('false', t)
        |           OR starts_with('no', t) OR t = '0'
        |           OR (length(t) >= 2 AND starts_with('off', t))) THEN false
        |         ELSE NULL END AS parsed
        |  FROM v)
        |SELECT p_partkey, raw, parsed,
        |  CASE WHEN parsed IS NULL THEN NULL
        |       WHEN parsed THEN 't' ELSE 'f' END AS rendered
        |FROM b""".stripMargin,
    "pg_array_render" ->
      """WITH p AS (SELECT p_partkey,
        |    [p_name, p_brand, nullif(p_type, 'PROMO')] AS a,
        |    string_split(p_name, ' ') AS t
        |  FROM part WHERE p_partkey <= 2000),
        |r AS (SELECT p_partkey,
        |    list_transform(a, e -> CASE WHEN e IS NULL THEN 'NULL'
        |      WHEN e = '' OR lower(e) = 'null' OR regexp_matches(e, '[\s,{}"\\]')
        |      THEN '"' || replace(replace(e, '\', '\\'), '"', '\"') || '"'
        |      ELSE e END) AS ra,
        |    list_transform(t, e -> CASE WHEN e IS NULL THEN 'NULL'
        |      WHEN e = '' OR lower(e) = 'null' OR regexp_matches(e, '[\s,{}"\\]')
        |      THEN '"' || replace(replace(e, '\', '\\'), '"', '\"') || '"'
        |      ELSE e END) AS rt
        |  FROM p)
        |SELECT p_partkey,
        |  '{' || array_to_string(ra, ',') || '}' AS arr_txt,
        |  '{' || array_to_string(rt, ',') || '}' AS toks_txt
        |FROM r""".stripMargin,
    "str_substr_pg" ->
      """WITH p AS (SELECT p_partkey, p_name,
        |  CAST(2 - (p_size % 6) AS INT) AS f
        |FROM part WHERE p_partkey <= 2000)
        |SELECT p_partkey,
        |  CASE WHEN (f + 5) - greatest(f, 1) <= 0 THEN ''
        |       ELSE substring(p_name, greatest(f, 1), (f + 5) - greatest(f, 1))
        |  END AS sub_var,
        |  substring(p_name, 1, 4) AS sub_zero,
        |  substring(p_name, 1, 1) AS sub_neg,
        |  substring(p_name, 2, 5) AS sub_plain
        |FROM p""".stripMargin,
    "sql_dialect" ->
      """WITH src AS (SELECT * FROM orders WHERE o_orderkey < 20000),
        |a AS (SELECT o_orderpriority, count(*) AS n,
        |        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |          AS cents
        |      FROM src GROUP BY ALL),
        |t AS (SELECT o_orderpriority,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS top_cents,
        |        o_orderkey AS top_key
        |      FROM src
        |      QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) = 1),
        |p AS (SELECT o_orderpriority,
        |        nullif(count(*) FILTER (o_orderstatus = 'F'), 0) AS f,
        |        nullif(count(*) FILTER (o_orderstatus = 'O'), 0) AS o,
        |        nullif(count(*) FILTER (o_orderstatus = 'P'), 0) AS p
        |      FROM src GROUP BY 1)
        |SELECT a.o_orderpriority, a.n, a.cents, t.top_cents, t.top_key,
        |       p.f, p.o, p.p
        |FROM a JOIN t USING (o_orderpriority) JOIN p USING (o_orderpriority)""".stripMargin,
    "temporal_agg" ->
      """SELECT event_type, count(*) AS n,
        |  min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us,
        |  CAST(sum(epoch_us(ts)) // count(*) AS VARCHAR) AS avg_us,
        |  CAST((sum(epoch_us(ts) // 1000000) // count(*)) AS BIGINT) AS avg_s
        |FROM events GROUP BY 1""".stripMargin,
    "window_pack" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS ep
        |FROM orders WHERE o_orderkey < 5000)
        |SELECT o_orderkey,
        |  lag(cents, 1) OVER w AS prev_cents,
        |  lead(cents, 1) OVER w AS next_cents,
        |  ntile(4) OVER w AS quartile,
        |  nth_value(cents, 2) OVER w AS second_cents,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY ep
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cents_30d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "array_pack" ->
      """WITH p AS (SELECT p_partkey, string_split(p_name, ' ') AS l
        |FROM part WHERE p_partkey <= 2000)
        |SELECT p_partkey,
        |  len(l) AS n_toks,
        |  list_contains(l, 'red') AS has_red,
        |  CAST(list_position(l, 'red') AS BIGINT) AS red_pos,
        |  array_to_string(l[1:2], '-') AS first2,
        |  array_to_string(list_sort(l), '-') AS sorted_toks,
        |  array_to_string(list_sort(list_distinct(l)), '-') AS dedup_toks,
        |  CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT) AS total_len,
        |  list_max(l) AS max_tok
        |FROM p""".stripMargin,
    "summarize_table" ->
      """WITH li AS (SELECT * FROM lineitem)
        |SELECT 'l_orderkey' AS cname, 'bigint' AS ctype,
        |  count(l_orderkey) AS cnt,
        |  count(*) - count(l_orderkey) AS nulls,
        |  count(DISTINCT l_orderkey) AS ndist,
        |  CAST(min(l_orderkey) AS VARCHAR) AS min_render,
        |  CAST(max(l_orderkey) AS VARCHAR) AS max_render,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_units,
        |  quantile_cont(l_orderkey, 0.5) AS q50_units
        |FROM li
        |UNION ALL SELECT 'l_linenumber', 'int', count(l_linenumber),
        |  count(*) - count(l_linenumber), count(DISTINCT l_linenumber),
        |  CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR),
        |  CAST(sum(l_linenumber) AS BIGINT), quantile_cont(l_linenumber, 0.5)
        |FROM li
        |UNION ALL SELECT 'l_quantity', 'double', count(c),
        |  count(*) - count(c), count(DISTINCT c),
        |  CAST(min(c) AS VARCHAR), CAST(max(c) AS VARCHAR),
        |  CAST(sum(c) AS BIGINT), quantile_cont(c, 0.5)
        |FROM (SELECT CAST(round(l_quantity * 100) AS BIGINT) AS c FROM li)
        |UNION ALL SELECT 'l_extendedprice', 'double', count(c),
        |  count(*) - count(c), count(DISTINCT c),
        |  CAST(min(c) AS VARCHAR), CAST(max(c) AS VARCHAR),
        |  CAST(sum(c) AS BIGINT), quantile_cont(c, 0.5)
        |FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM li)
        |UNION ALL SELECT 'l_returnflag', 'string', count(l_returnflag),
        |  count(*) - count(l_returnflag), count(DISTINCT l_returnflag),
        |  min(l_returnflag), max(l_returnflag),
        |  NULL, CAST(NULL AS DOUBLE)
        |FROM li
        |UNION ALL SELECT 'l_linestatus', 'string', count(l_linestatus),
        |  count(*) - count(l_linestatus), count(DISTINCT l_linestatus),
        |  min(l_linestatus), max(l_linestatus),
        |  NULL, CAST(NULL AS DOUBLE)
        |FROM li
        |UNION ALL SELECT 'l_shipdate', 'timestamp', count(c),
        |  count(*) - count(c), count(DISTINCT c),
        |  CAST(min(c) AS VARCHAR), CAST(max(c) AS VARCHAR),
        |  CAST(sum(c) AS BIGINT), quantile_cont(c, 0.5)
        |FROM (SELECT CAST(floor(epoch(l_shipdate)) AS BIGINT) AS c FROM li)""".stripMargin,
    "temporal_pack" ->
      """SELECT event_id,
        |  CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS week_start,
        |  CAST(floor(epoch(date_trunc('quarter', ts))) AS BIGINT) AS quarter_start,
        |  (ts::DATE + INTERVAL 2 MONTH)::DATE AS plus_2m,
        |  CAST(isodow(ts) AS INT) AS isodow,
        |  last_day(ts::DATE) AS month_end,
        |  CAST(floor(epoch(ts)) + 19800 AS BIGINT) AS kolkata_wall_epoch,
        |  make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT), 1) AS month_start
        |FROM events WHERE event_id < 2000""".stripMargin,
    "str_pack3" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey <= 500),
        |v AS (SELECT p_partkey, p_name,
        |    concat(p_name, '-', p_partkey) AS t,
        |    translate(p_name, 'a', '"') AS qsrc,
        |    translate(p_name, 'e', '''') AS lsrc
        |  FROM p)
        |SELECT p_partkey,
        |  '"' || replace(qsrc, '"', '""') || '"' AS qident,
        |  '''' || replace(lsrc, '''', '''''') || '''' AS qlit,
        |  CASE WHEN p_partkey % 3 = 0
        |       THEN '''' || replace(lsrc, '''', '''''') || ''''
        |       ELSE 'NULL' END AS qnullable,
        |  ascii(substr(p_name, 2, 1)) AS b1,
        |  CAST((ascii(substr(p_name, 2, 1)) // 16) % 2 AS INT) AS bit12,
        |  substr(p_name, 1, 1) || 'Z' || substr(p_name, 3) AS sb,
        |  CAST(CASE WHEN p_partkey % 3 = 0 THEN 0 ELSE 1 END AS INT) AS n_nulls,
        |  CAST(CASE WHEN p_partkey % 3 = 0 THEN 2 ELSE 1 END AS INT) AS n_nonnulls,
        |  CAST(strpos(t, regexp_extract(t, '[0-9]+')) AS INT) AS digit_pos,
        |  array_to_string(list_filter(string_split_regex(t, '[^A-Za-z]+'),
        |    x -> x <> ''), '|') AS alpha_toks
        |FROM v""".stripMargin,
    "inet_pack" ->
      """WITH e AS (SELECT event_id,
        |    user_id % 223 + 1 AS a, (user_id * 7) % 256 AS b,
        |    (user_id * 13) % 256 AS c, (user_id * 29) % 256 AS d,
        |    (user_id % 25) + 8 AS m
        |  FROM events WHERE event_id < 500),
        |v AS (SELECT event_id, concat_ws('.', a, b, c, d) AS host, m,
        |    a * 16777216 + b * 65536 + c * 256 + d AS ipl,
        |    CAST(pow(2, 32 - m) AS BIGINT) AS sz
        |  FROM e),
        |n AS (SELECT *, (ipl // sz) * sz AS net, (ipl // sz) * sz + sz - 1 AS bc FROM v)
        |SELECT event_id, concat_ws('/', host, m) AS ip, host,
        |  CAST(m AS INT) AS mlen, 4 AS fam,
        |  concat_ws('/', concat_ws('.', (net // 16777216) % 256, (net // 65536) % 256,
        |    (net // 256) % 256, net % 256), m) AS network,
        |  concat_ws('.', (bc // 16777216) % 256, (bc // 65536) % 256,
        |    (bc // 256) % 256, bc % 256) AS bcast,
        |  host || '/16' AS m16,
        |  ipl >= 2147483648 AS in_upper
        |FROM n""".stripMargin,
    "str_pack2" ->
      """SELECT p_partkey,
        |  array_to_string(list_transform(string_split(lower(p_name), ' '),
        |    w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS name_cap,
        |  to_base64(encode(p_brand)) AS brand_b64,
        |  decode(from_base64(to_base64(encode(p_type)))) AS type_rt,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |  bin(p_partkey) AS key_bin,
        |  printf('%s#%d', p_brand, p_size) AS tag,
        |  coalesce(regexp_extract(p_type, '[A-Z]+'), '') AS first_caps
        |FROM part""".stripMargin,
    "math_ext_pack" -> {
      import graft.functions.MathExt.{sql => m}
      s"""WITH grid AS (SELECT doc_id,
         |    CAST(doc_id - 10 AS DOUBLE) / 4.0 AS x,
         |    CAST(doc_id * 7 + 1 AS DOUBLE) AS deg
         |  FROM documents WHERE doc_id < 21)
         |SELECT doc_id,
         |  CAST(round(${m.erf("x")} * 10000) AS BIGINT) AS erf_q,
         |  CAST(round(${m.erfc("x")} * 10000) AS BIGINT) AS erfc_q,
         |  CAST(round(${m.cotd("deg")} * 10000) AS BIGINT) AS cotd_q,
         |  doc_id // 3 AS div3,
         |  CAST(epoch(make_timestamp(2026, 3, doc_id % 27 + 1, 12, 30, 0)) AS BIGINT)
         |    AS mk_ts_epoch
         |FROM grid""".stripMargin
    },
    "q19_date_bin" ->
      // floor(), not CAST: epoch() is fractional and CAST rounds-half-even,
      // while Spark's unix_timestamp truncates toward zero
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 AS bin,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "json_variant" ->
      """SELECT event_type,
        |  count(json_extract_string(props, '$.k')) AS n_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(DISTINCT json_extract_string(props, '$.tag')) AS n_tags
        |FROM events GROUP BY event_type""".stripMargin,
    "str_math_pack" ->
      """SELECT p_partkey,
        |  gcd(p_partkey, 24) AS gcd24,
        |  lcm(p_partkey % 7 + 1, 6) AS lcm6,
        |  CAST(octet_length(CAST(p_name AS BLOB)) AS BIGINT) AS name_bytes,
        |  lower(to_hex(p_partkey)) AS key_hex,
        |  translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
        |  CAST(CASE WHEN p_size < 0 THEN 0
        |            WHEN CAST(p_size AS DOUBLE) >= 50.0 THEN 6
        |            ELSE floor(CAST(p_size AS DOUBLE) * 5 / 50.0) + 1 END AS BIGINT)
        |    AS size_bucket
        |FROM part""".stripMargin,
    "sql_macro" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin,
    "approx_sketches" -> "SELECT true AS acd_ok, true AS pq_ok",
    "fmt_roundtrip" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |  count(*) AS n_nations, min(n_name) AS first_name
        |FROM nation GROUP BY 1""".stripMargin,
    "q15_cross_nl" ->
      """SELECT count(*) AS n_pairs
        |FROM supplier a JOIN supplier b ON a.s_acctbal > b.s_acctbal""".stripMargin,
    "seq_assign" ->
      """SELECT n_nationkey,
        |  CAST(row_number() OVER (ORDER BY n_nationkey) AS BIGINT) AS seq_id
        |FROM nation""".stripMargin,
    "geo_knn" ->
      s"""WITH $lonLat
         |SELECT c_custkey, CAST(round($haversine) AS BIGINT) AS km_q
         |FROM pts ORDER BY $haversine, c_custkey LIMIT 10""".stripMargin,
    "geo_bbox" ->
      s"""WITH $lonLat
         |SELECT count(*) AS n_inside FROM pts
         |WHERE lon >= -60.0 AND lon <= 60.0 AND lat >= -30.0 AND lat <= 30.0""".stripMargin,
    "geo_cell_search" ->
      s"""WITH $lonLat
         |SELECT c_custkey FROM pts
         |WHERE lon >= -60.0 AND lon <= 60.0 AND lat >= -30.0 AND lat <= 30.0""".stripMargin,
    "geo_polygon_contains" -> polygonOracle,
    "geo_polygon_cells" -> polygonOracle,
    "geo_wkb_roundtrip" ->
      s"""WITH $lonLat
         |SELECT c_custkey, lon, lat FROM pts""".stripMargin,
    "geo_geojson" -> polygonOracle,
    "geo_wkb_kinds" ->
      """SELECT * FROM (VALUES
        |  ('collection', true), ('linestring', true), ('multilinestring', true),
        |  ('multipoint', true), ('multipolygon', true), ('point', true),
        |  ('polygon', true), ('polygon_hole', true)) AS t(kind, ok)""".stripMargin,
    // shell1 minus its hole, OR shell2 — per-ring even-odd crossing counts
    // with the same half-plane arithmetic as GeoGeom.inRing
    "geo_multipolygon_contains" ->
      s"""WITH $lonLat,
         |s1(x1, y1, x2, y2) AS (VALUES
         |  (-60.0, -30.0, 0.0, -30.0), (0.0, -30.0, 0.0, 30.0),
         |  (0.0, 30.0, -60.0, 30.0), (-60.0, 30.0, -60.0, -30.0)),
         |h1(x1, y1, x2, y2) AS (VALUES
         |  (-40.0, -10.0, -20.0, -10.0), (-20.0, -10.0, -20.0, 10.0),
         |  (-20.0, 10.0, -40.0, 10.0), (-40.0, 10.0, -40.0, -10.0)),
         |s2(x1, y1, x2, y2) AS (VALUES
         |  (20.0, -20.0, 60.0, -20.0), (60.0, -20.0, 60.0, 20.0),
         |  (60.0, 20.0, 20.0, 20.0), (20.0, 20.0, 20.0, -20.0)),
         |c1 AS (SELECT c_custkey, count(*) AS n FROM pts, s1
         |       WHERE ((y1 > lat) <> (y2 > lat))
         |         AND lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
         |       GROUP BY c_custkey),
         |ch AS (SELECT c_custkey, count(*) AS n FROM pts, h1
         |       WHERE ((y1 > lat) <> (y2 > lat))
         |         AND lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
         |       GROUP BY c_custkey),
         |c2 AS (SELECT c_custkey, count(*) AS n FROM pts, s2
         |       WHERE ((y1 > lat) <> (y2 > lat))
         |         AND lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
         |       GROUP BY c_custkey)
         |SELECT p.c_custkey FROM pts p
         |LEFT JOIN c1 ON p.c_custkey = c1.c_custkey
         |LEFT JOIN ch ON p.c_custkey = ch.c_custkey
         |LEFT JOIN c2 ON p.c_custkey = c2.c_custkey
         |WHERE (coalesce(c1.n, 0) % 2 = 1 AND coalesce(ch.n, 0) % 2 = 0)
         |   OR coalesce(c2.n, 0) % 2 = 1""".stripMargin,
    "geo_distance_between" ->
      s"""WITH $lonLat
         |SELECT c_custkey FROM pts
         |WHERE ($haversine) * 1000.0 >= 3000000.0
         |  AND ($haversine) * 1000.0 < 8000000.0""".stripMargin,
    "ai_embed" -> {
      val comps = (0 until 8).map { k =>
        val nibs = (0 until 4).map { j =>
          val pos = 4 * k + j + 1
          val mult = 1 << (4 * (3 - j))
          s"(strpos('0123456789abcdef', substr(h, $pos, 1)) - 1) * $mult"
        }.mkString(" + ")
        s"CAST(round(CAST($nibs AS DOUBLE) / 65536.0 * 10000) AS BIGINT) AS e${k}_q"
      }.mkString(",\n  ")
      s"""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 20)
         |SELECT doc_id, $comps FROM h""".stripMargin
    })
}
