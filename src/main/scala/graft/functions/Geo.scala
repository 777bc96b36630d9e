package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal geo function surface (SURVEY.md §2.8 geo row — reference
  * /root/reference/libs/geo/ with S2 backing; scalar surface
  * server/connector/functions/search.h:121-124: ST_Distance_Between,
  * ST_Intersects, ST_Contains). Pure Catalyst expressions: WKT POINT
  * make/parse via string functions, spherical distance via haversine —
  * codegen'd, no UDF, so the surface scales like any other column math.
  * S2-cell indexed pushdown remains future work; this is the scalar layer.
  */
object Geo {
  val EarthRadiusKm = 6371.0088

  /** WKT `POINT(lon lat)` constructor. */
  def stPoint(lon: Column, lat: Column): Column =
    concat(lit("POINT("), lon.cast("string"), lit(" "), lat.cast("string"), lit(")"))

  /** X (lon) of a WKT POINT. */
  def stX(wkt: Column): Column =
    regexp_extract(wkt, "POINT\\(([-0-9.eE]+) ([-0-9.eE]+)\\)", 1).cast("double")

  /** Y (lat) of a WKT POINT. */
  def stY(wkt: Column): Column =
    regexp_extract(wkt, "POINT\\(([-0-9.eE]+) ([-0-9.eE]+)\\)", 2).cast("double")

  /** Great-circle distance in km between two lon/lat points (haversine —
    * the ST_Distance_Between analogue for points). */
  def stDistanceSphereKm(lon1: Column, lat1: Column,
      lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Classic geohash (public-domain algorithm): interleaved lon/lat bisection
    * to `precision` base-32 chars — the cell-token stand-in for the
    * reference's S2 covering cells (geo_filter_builder.cpp:599-661). */
  def geohash(lat: Double, lon: Double, precision: Int): String = {
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val sb = new java.lang.StringBuilder(precision)
    var bit = 0; var ch = 0; var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Cell width/height in degrees at a precision. */
  def cellSize(precision: Int): (Double, Double) = {
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    (360.0 / (1L << lonBits), 180.0 / (1L << latBits))
  }

  /** Bounds of a geohash cell (inverse of [[geohash]]):
    * (lonLo, latLo, lonHi, latHi). */
  def cellBounds(gh: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0; var lonLo = -180.0; var lonHi = 180.0
    var even = true
    gh.foreach { c =>
      val ch = Base32.indexOf(c)
      require(ch >= 0, s"not a geohash char: $c")
      var b = 4
      while (b >= 0) {
        val bit = (ch >> b) & 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        even = !even; b -= 1
      }
    }
    (lonLo, latLo, lonHi, latHi)
  }

  /** How a cell rectangle relates to a query shape: drives the adaptive
    * covering recursion (the S2 covering interior/boundary distinction,
    * geo_filter_builder.cpp:599-661). */
  sealed trait CellRel
  case object CellInside extends CellRel   // emit at this (coarse) level
  case object CellOutside extends CellRel  // prune the whole subtree
  case object CellPartial extends CellRel  // subdivide (or emit at max depth)

  /** Adaptive mixed-precision covering: start from the 32 precision-1 cells,
    * keep cells fully inside the shape at their coarsest level, subdivide
    * boundary cells down to `maxPrecision`. Returns geohash PREFIXES of
    * mixed lengths — against an index tokenized at a fine fixed precision,
    * each prefix is a term-range read (geohash is hierarchical: child cells
    * extend the parent string). Any covering superset is correct; the exact
    * refine runs after the index lookup. */
  def adaptiveCover(classify: (Double, Double, Double, Double) => CellRel,
      maxPrecision: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    def go(prefix: String): Unit = Base32.foreach { c =>
      val cell = prefix + c
      val (lo, la, hi, ha) = cellBounds(cell)
      classify(lo, la, hi, ha) match {
        case CellOutside => ()
        case CellInside => out += cell
        case CellPartial =>
          if (cell.length >= maxPrecision) out += cell else go(cell)
      }
    }
    go("")
    out.result()
  }

  /** Finest precision whose estimated boundary-cell count fits `budget` —
    * the query-shape-derived precision of the adaptive covering (small
    * shapes refine further, large shapes stay coarse; the S2
    * max_cells-style knob). The default budget tolerates a few hundred
    * boundary cells: each covering cell is one pushable term-range over the
    * (small) term dictionary, so predicate size — not IO — is the only
    * cost of a finer boundary. */
  def targetPrecision(width: Double, height: Double, maxPrecision: Int,
      budget: Int = 256): Int =
    (maxPrecision to 1 by -1).find { p =>
      val (cw, ch) = cellSize(p)
      2 * (width / cw + height / ch) <= budget
    }.getOrElse(1)

  /** Adaptive covering of an axis-aligned bbox. */
  def adaptiveCoverBox(minLon: Double, minLat: Double,
      maxLon: Double, maxLat: Double, maxPrecision: Int): Seq[String] = {
    val p = targetPrecision(maxLon - minLon, maxLat - minLat, maxPrecision)
    adaptiveCover((lo, la, hi, ha) =>
      if (lo >= minLon && hi <= maxLon && la >= minLat && ha <= maxLat) CellInside
      else if (lo > maxLon || hi < minLon || la > maxLat || ha < minLat) CellOutside
      else CellPartial, p)
  }

  /** Driver-side even-odd point-in-polygon (same crossing arithmetic as
    * [[stContainsPolygon]]). */
  def pointInPolygon(verts: Seq[(Double, Double)], px: Double, py: Double): Boolean = {
    var n = 0
    var i = 0
    while (i < verts.length - 1) {
      val (ax, ay) = verts(i); val (bx, by) = verts(i + 1)
      if ((ay > py) != (by > py) && px < (bx - ax) * (py - ay) / (by - ay) + ax) n += 1
      i += 1
    }
    n % 2 == 1
  }

  private def segsIntersect(p1: (Double, Double), p2: (Double, Double),
      p3: (Double, Double), p4: (Double, Double)): Boolean = {
    def orient(a: (Double, Double), b: (Double, Double), c: (Double, Double)) =
      math.signum((b._1 - a._1) * (c._2 - a._2) - (b._2 - a._2) * (c._1 - a._1))
    val (d1, d2) = (orient(p3, p4, p1), orient(p3, p4, p2))
    val (d3, d4) = (orient(p1, p2, p3), orient(p1, p2, p4))
    (d1 != d2 && d3 != d4) ||
      // collinear touch counts as intersecting (conservative → Partial)
      (d1 == 0 && onSeg(p3, p4, p1)) || (d2 == 0 && onSeg(p3, p4, p2)) ||
      (d3 == 0 && onSeg(p1, p2, p3)) || (d4 == 0 && onSeg(p1, p2, p4))
  }

  private def onSeg(a: (Double, Double), b: (Double, Double),
      p: (Double, Double)): Boolean =
    p._1 >= math.min(a._1, b._1) && p._1 <= math.max(a._1, b._1) &&
      p._2 >= math.min(a._2, b._2) && p._2 <= math.max(a._2, b._2)

  /** Adaptive covering of a WKT polygon: a cell is Inside when no polygon
    * edge crosses it and its center is inside; Partial when an edge crosses
    * it or the polygon sits wholly within it; Outside otherwise. */
  def adaptiveCoverPolygon(wkt: String, maxPrecision: Int): Seq[String] = {
    val vs = parseWktPolygon(wkt)
    val (w, h) = (vs.map(_._1).max - vs.map(_._1).min,
      vs.map(_._2).max - vs.map(_._2).min)
    val p = targetPrecision(w, h, maxPrecision)
    adaptiveCover((lo, la, hi, ha) => {
      val corners = Seq((lo, la), (hi, la), (hi, ha), (lo, ha))
      val rectEdges = corners.zip(corners.tail :+ corners.head)
      val edgeCrosses = vs.sliding(2).exists { e =>
        rectEdges.exists { case (a, b) => segsIntersect(e(0), e(1), a, b) }
      }
      if (edgeCrosses) CellPartial
      else if (vs.exists { case (x, y) => x > lo && x < hi && y > la && y < ha })
        CellPartial // polygon wholly inside the cell
      else if (pointInPolygon(vs, (lo + hi) / 2, (la + ha) / 2)) CellInside
      else CellOutside
    }, p)
  }

  /** All geohash cells intersecting a bbox — the covering set driving the
    * in-index candidate lookup (exact refine happens after). */
  def coverBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
      precision: Int): Seq[String] = {
    val (w, h) = cellSize(precision)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var lat = math.floor((minLat + 90.0) / h) * h - 90.0 + h / 2
    while (lat <= maxLat + h / 2) {
      var lon = math.floor((minLon + 180.0) / w) * w - 180.0 + w / 2
      while (lon <= maxLon + w / 2) {
        out += geohash(math.max(-90, math.min(90, lat)),
          math.max(-180, math.min(180, lon)), precision)
        lon += w
      }
      lat += h
    }
    out.toSeq
  }

  /** Axis-aligned bbox containment — the ST_Contains(box, point) case. */
  def stContainsBox(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column,
      lon: Column, lat: Column): Column =
    lon >= minLon && lon <= maxLon && lat >= minLat && lat <= maxLat

  // ---- polygons (reference libs/geo/wkb.cpp, geo_json.cpp WKT/WKB surface;
  // ---- planar semantics like the reference's geometry_wkt.test cases) ----

  /** Outer ring of a WKT `POLYGON((x y, x y, ...))` as
    * `ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>` — pure string expressions, so a
    * literal WKT constant-folds to an array literal at plan time. Holes
    * (inner rings) are not parsed — document them as unsupported rather
    * than silently wrong: the extract takes the FIRST ring only. */
  def stPolygonOuter(wkt: Column): Column = {
    val ring = regexp_extract(wkt, "POLYGON\\s*\\(\\(([^)]*)\\)", 1)
    transform(split(ring, ","), p => {
      val xy = split(trim(p), "\\s+")
      struct(element_at(xy, 1).cast("double").as("x"),
        element_at(xy, 2).cast("double").as("y"))
    })
  }

  /** Point-in-polygon by the even-odd (ray casting) rule over the closed
    * ring: count edges whose half-plane crossing test passes, odd = inside.
    * The crossing test is written in the exact arithmetic order
    * `(x2-x1)*(py-y1)/(y2-y1)+x1` so a SQL oracle repeating the same
    * expression is bit-identical in IEEE doubles.
    *
    * `px`/`py` are threaded through the aggregate's ZERO accumulator, so
    * they evaluate exactly once per row no matter what the optimizer
    * inlines into them — an earlier filter-lambda version re-evaluated
    * them per EDGE, which turned a pushed-down `from_json` point parse
    * into 2×edges JSON parses per row (measured 2.2 s vs 0.25 s at
    * sf0.1). `verts` is still referenced per edge: pass it as an
    * attribute or a literal (the TextExprs.shinglesOf caveat). Boundary
    * points follow ray-casting's standard half-open semantics. */
  def stContainsPolygon(verts: Column, px: Column, py: Column): Column = {
    val crossings = aggregate(
      sequence(lit(0), size(verts) - 2),
      struct(px.cast("double").as("px"), py.cast("double").as("py"),
        lit(0).as("n")),
      (acc, i) => {
        val (p, q) = (acc.getField("px"), acc.getField("py"))
        val a = element_at(verts, i + 1)
        val b = element_at(verts, i + 2)
        val (ax, ay) = (a.getField("x"), a.getField("y"))
        val (bx, by) = (b.getField("x"), b.getField("y"))
        val crosses = ((ay > q) =!= (by > q)) &&
          (p < (bx - ax) * (q - ay) / (by - ay) + ax)
        struct(p.as("px"), q.as("py"),
          (acc.getField("n") + when(crosses, 1).otherwise(0)).as("n"))
      },
      acc => acc.getField("n"))
    crossings % 2 === 1
  }

  /** Envelope (bounding box) of a ring: STRUCT<minx, miny, maxx, maxy>. */
  def stEnvelope(verts: Column): Column = struct(
    array_min(transform(verts, v => v.getField("x"))).as("minx"),
    array_min(transform(verts, v => v.getField("y"))).as("miny"),
    array_max(transform(verts, v => v.getField("x"))).as("maxx"),
    array_max(transform(verts, v => v.getField("y"))).as("maxy"))

  /** ST_Intersects on bounding boxes: the polygon's envelope vs an
    * axis-aligned box — the coarse pre-filter that drives covering-cell
    * candidate lookup before the exact refine. */
  def stIntersectsBox(verts: Column, minLon: Column, minLat: Column,
      maxLon: Column, maxLat: Column): Column = {
    val e = stEnvelope(verts)
    e.getField("minx") <= maxLon && e.getField("maxx") >= minLon &&
      e.getField("miny") <= maxLat && e.getField("maxy") >= minLat
  }

  /** A WKT POLYGON as a TRUE array-of-struct literal, parsed once on the
    * driver. Prefer this over `stPolygonOuter(lit(wkt))` whenever the
    * polygon is a constant: higher-order functions are not constant-folded,
    * so the expression-parse form re-runs regexp+split per ROW and — inside
    * the containment lambda — per EDGE (the TextExprs.shinglesOf lesson;
    * measured 1.8 s vs 0.1 s at sf0.1). */
  def polygonLit(wkt: String): Column =
    array(parseWktPolygon(wkt).map { case (x, y) =>
      struct(lit(x).as("x"), lit(y).as("y")) }: _*)

  /** Driver-side WKT POLYGON outer-ring parse (for planning covering cells;
    * mirrors stPolygonOuter exactly). */
  def parseWktPolygon(wkt: String): Seq[(Double, Double)] = {
    val m = java.util.regex.Pattern.compile("POLYGON\\s*\\(\\(([^)]*)\\)").matcher(wkt)
    require(m.find(), s"not a WKT POLYGON: $wkt")
    m.group(1).split(",").toSeq.map { p =>
      val xy = p.trim.split("\\s+")
      (xy(0).toDouble, xy(1).toDouble)
    }
  }

  /** Geohash cells covering a polygon's envelope — the covering set for the
    * in-index candidate lookup; any superset is correct because the exact
    * containment refine runs after. */
  def coverPolygon(wkt: String, precision: Int): Seq[String] = {
    val vs = parseWktPolygon(wkt)
    coverBox(vs.map(_._1).min, vs.map(_._2).min,
      vs.map(_._1).max, vs.map(_._2).max, precision)
  }

  // ---- WKB (native expressions, GeoWkb.scala) and GeoJSON (reference
  // ---- libs/geo/wkb.cpp, geo_json.cpp) ----

  /** 21-byte NDR WKB POINT from lon/lat — codegen'd native expression. */
  def stAsWkb(lon: Column, lat: Column): Column =
    call_function("st_aswkb", lon.cast("double"), lat.cast("double"))

  /** X of a WKB POINT (either byte order); null on malformed/non-point. */
  def stWkbX(wkb: Column): Column = call_function("st_wkb_x", wkb)

  /** Y of a WKB POINT (either byte order); null on malformed/non-point. */
  def stWkbY(wkb: Column): Column = call_function("st_wkb_y", wkb)

  private val geoJsonPointSchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("coordinates",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))

  private val geoJsonPolygonSchema =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("coordinates",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType))))))

  /** GeoJSON `{"type":"Point","coordinates":[x,y]}` from lon/lat. */
  def asGeoJsonPoint(lon: Column, lat: Column): Column =
    to_json(struct(lit("Point").as("type"),
      array(lon.cast("double"), lat.cast("double")).as("coordinates")))

  /** Parse a GeoJSON Point column → STRUCT<x, y>; null unless type=Point. */
  def geoJsonPoint(json: Column): Column = {
    val p = from_json(json, geoJsonPointSchema)
    when(p.getField("type") === "Point",
      struct(element_at(p.getField("coordinates"), 1).as("x"),
        element_at(p.getField("coordinates"), 2).as("y")))
  }

  /** Outer ring of a GeoJSON Polygon column as ARRAY<STRUCT<x, y>> (the
    * stPolygonOuter shape — holes ignored); null unless type=Polygon.
    *
    * For CONSTANT polygons use [[geoJsonPolygonLit]] instead: an alias of
    * this expression gets substituted into the containment lambda by
    * projection collapse, and lambda bodies re-evaluate their embedded
    * expressions per edge — the from_json would re-parse per edge per row
    * (measured 1.9 s vs 0.1 s at sf0.1; the TextExprs.shinglesOf caveat). */
  def geoJsonPolygonOuter(json: Column): Column = {
    val p = from_json(json, geoJsonPolygonSchema)
    when(p.getField("type") === "Polygon",
      transform(element_at(p.getField("coordinates"), 1),
        q => struct(element_at(q, 1).as("x"), element_at(q, 2).as("y"))))
  }

  /** A constant GeoJSON Polygon's outer ring as a TRUE array literal,
    * parsed once on the driver — the geoJsonPolygonOuter analogue of
    * [[polygonLit]], safe to embed in HOF lambdas. */
  def geoJsonPolygonLit(json: String): Column =
    array(parseGeoJsonPolygon(json).map { case (x, y) =>
      struct(lit(x).as("x"), lit(y).as("y")) }: _*)

  /** Driver/row-side GeoJSON geometry parse: Left(point) or Right(outer
    * ring). Point + Polygon are the kinds the reference's geo_search.test
    * exercises over the geojson dictionary (geo_search.test:1-60). */
  def parseGeoJsonGeom(json: String): Either[(Double, Double), Seq[(Double, Double)]] = {
    val c = json.replaceAll("\\s+", "")
    if (c.contains("\"type\":\"Point\"")) {
      val m = java.util.regex.Pattern.compile(
        "\"coordinates\"\\s*:\\s*\\[([^\\]]*)\\]").matcher(json)
      require(m.find(), s"no coordinates in: $json")
      val xy = m.group(1).split(",")
      Left((xy(0).trim.toDouble, xy(1).trim.toDouble))
    } else Right(parseGeoJsonPolygon(json))
  }

  /** Exact geometry intersection over parsed GeoJSON kinds — point/point,
    * point-in-polygon (even-odd), polygon/polygon (shared area: any vertex
    * containment either way, or any edge crossing). Row-eval kernel behind
    * the st_intersects SQL predicate; the indexed fast path is the cell
    * covering drive (geo_cell_search). */
  def geomIntersects(aJson: String, bJson: String): Boolean = {
    if (aJson == null || bJson == null) return false
    (parseGeoJsonGeom(aJson), parseGeoJsonGeom(bJson)) match {
      case (Left((ax, ay)), Left((bx, by))) => ax == bx && ay == by
      case (Left((ax, ay)), Right(poly)) => pointInPolygon(poly, ax, ay)
      case (Right(poly), Left((bx, by))) => pointInPolygon(poly, bx, by)
      case (Right(pa), Right(pb)) =>
        pa.exists { case (x, y) => pointInPolygon(pb, x, y) } ||
        pb.exists { case (x, y) => pointInPolygon(pa, x, y) } ||
        ringEdges(pa).exists { ea => ringEdges(pb).exists { eb =>
          segsIntersect(ea._1, ea._2, eb._1, eb._2) } }
    }
  }

  /** Exact geometry containment: container ⊇ contained. A polygon contains
    * a point by even-odd test; contains a polygon when every vertex of the
    * contained ring is inside and no edges cross. */
  def geomContains(containerJson: String, containedJson: String): Boolean = {
    if (containerJson == null || containedJson == null) return false
    (parseGeoJsonGeom(containerJson), parseGeoJsonGeom(containedJson)) match {
      case (Left((ax, ay)), Left((bx, by))) => ax == bx && ay == by
      case (Left(_), Right(_)) => false
      case (Right(poly), Left((bx, by))) => pointInPolygon(poly, bx, by)
      case (Right(pa), Right(pb)) =>
        pb.forall { case (x, y) => pointInPolygon(pa, x, y) } &&
        !ringEdges(pa).exists { ea => ringEdges(pb).exists { eb =>
          segsIntersect(ea._1, ea._2, eb._1, eb._2) } }
    }
  }

  private def ringEdges(vs: Seq[(Double, Double)]): Seq[((Double, Double), (Double, Double))] = {
    val closed = if (vs.nonEmpty && vs.head == vs.last) vs else vs :+ vs.head
    closed.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
  }

  /** Driver-side GeoJSON Polygon outer-ring parse (no JSON library — the
    * grammar of `{"type":"Polygon","coordinates":[[[x,y],...],...]}` is
    * regular enough for a split parse; holes ignored like everywhere). */
  def parseGeoJsonPolygon(json: String): Seq[(Double, Double)] = {
    require(json.replaceAll("\\s+", "").contains("\"type\":\"Polygon\""),
      s"not a GeoJSON Polygon: $json")
    // the outer ring is the first [[...]] — pairs separate with "],[" so
    // the first "]]" closes the ring
    val m = java.util.regex.Pattern.compile(
      "\"coordinates\"\\s*:\\s*\\[\\s*\\[(.*?)\\]\\s*\\]", java.util.regex.Pattern.DOTALL)
      .matcher(json)
    require(m.find(), s"no coordinates in: $json")
    m.group(1).split("\\]\\s*,\\s*\\[").toSeq.map { p =>
      val xy = p.replaceAll("[\\[\\]]", "").split(",")
      (xy(0).trim.toDouble, xy(1).trim.toDouble)
    }
  }
}
