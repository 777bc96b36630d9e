package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GeoSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val wkt = "POLYGON((0 40, 38 12, 24 -32, -24 -32, -38 12, 0 40))"
  private val ring = Geo.parseWktPolygon(wkt)

  /** Reference even-odd test in plain Scala (same arithmetic order). */
  private def insideRef(px: Double, py: Double): Boolean = {
    var c = 0
    ring.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      if (((y1 > py) != (y2 > py)) && px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
        c += 1
    }
    c % 2 == 1
  }

  test("WKT polygon parse matches the driver-side parser") {
    val got = spark.range(1)
      .select(Geo.stPolygonOuter(lit(wkt)).as("v"))
      .selectExpr("transform(v, p -> array(p.x, p.y)) AS v")
      .head().getSeq[scala.collection.Seq[Double]](0)
    assert(got.map(p => (p(0), p(1))).toList == ring.toList)
  }

  test("polygonLit equals the expression parse") {
    val a = spark.range(1).select(Geo.stPolygonOuter(lit(wkt)).as("v"))
      .selectExpr("transform(v, p -> array(p.x, p.y)) AS v").head().getSeq[Any](0)
    val b = spark.range(1).select(Geo.polygonLit(wkt).as("v"))
      .selectExpr("transform(v, p -> array(p.x, p.y)) AS v").head().getSeq[Any](0)
    assert(a == b)
  }

  test("expression containment equals the reference implementation on a grid") {
    val ss = spark
    import ss.implicits._
    val pts = for (x <- -50 to 50 by 7; y <- -50 to 50 by 7)
      yield (x + 0.5, y + 0.5)
    val got = pts.toDF("px", "py")
      .select(col("px"), col("py"),
        Geo.stContainsPolygon(Geo.stPolygonOuter(lit(wkt)), col("px"), col("py")).as("in"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == insideRef(x, y), s"mismatch at ($x, $y)")
    }
    assert(pts.count { case (x, y) => insideRef(x, y) } > 0, "grid must hit the polygon")
  }

  test("envelope and bbox-intersects") {
    val df = spark.range(1).select(
      Geo.stEnvelope(Geo.stPolygonOuter(lit(wkt))).as("e"),
      Geo.stIntersectsBox(Geo.stPolygonOuter(lit(wkt)),
        lit(50.0), lit(50.0), lit(60.0), lit(60.0)).as("far"),
      Geo.stIntersectsBox(Geo.stPolygonOuter(lit(wkt)),
        lit(30.0), lit(30.0), lit(60.0), lit(60.0)).as("near"))
    val r = df.head()
    val e = r.getStruct(0)
    assert((e.getDouble(0), e.getDouble(1), e.getDouble(2), e.getDouble(3))
      == ((-38.0, -32.0, 38.0, 40.0)))
    assert(!r.getBoolean(1) && r.getBoolean(2))
  }

  test("covering cells contain every inside point's cell") {
    val cover = Geo.coverPolygon(wkt, 2).toSet
    for (x <- -40 to 40 by 5; y <- -35 to 40 by 5 if insideRef(x + 0.5, y + 0.5)) {
      val gh = Geo.geohash(y + 0.5, x + 0.5, 2)
      assert(cover.contains(gh), s"covering set missing cell $gh of inside point ($x, $y)")
    }
  }

  test("adaptive covering is complete and prunes by shape size") {
    // completeness for the polygon: every inside point's fine cell has an
    // ancestor (prefix) in the mixed-precision covering
    val polyCover = Geo.adaptiveCoverPolygon(wkt, 4)
    for (x <- -40 to 40 by 3; y <- -35 to 40 by 3 if insideRef(x + 0.5, y + 0.5)) {
      val gh = Geo.geohash(y + 0.5, x + 0.5, 4)
      assert(polyCover.exists(gh.startsWith),
        s"covering missing a prefix of $gh for inside point ($x, $y)")
    }

    // completeness for boxes, including one crossing the equator/meridian
    for ((lo, la, hi, ha) <- Seq((-60.0, -30.0, 60.0, 30.0),
        (3.0, 7.0, 4.5, 8.5), (-1.0, -1.0, 1.0, 1.0))) {
      val cover = Geo.adaptiveCoverBox(lo, la, hi, ha, 4)
      var x = lo + 0.01
      while (x < hi) {
        var y = la + 0.01
        while (y < ha) {
          val gh = Geo.geohash(y, x, 4)
          assert(cover.exists(gh.startsWith), s"box cover missing ($x, $y)")
          y += (ha - la) / 7
        }
        x += (hi - lo) / 7
      }
    }

    // pruning ratio: the covered area of a SMALL box must be within a small
    // factor of the box itself — the fixed precision-2 covering was ~1 cell
    // of 11.25°x5.625° (≈63 deg²) for this 2.25 deg² box, a 28x blowup
    def coveredArea(cells: Seq[String]): Double = cells.map { c =>
      val (lo, la, hi, ha) = Geo.cellBounds(c)
      (hi - lo) * (ha - la)
    }.sum
    val small = Geo.adaptiveCoverBox(3.0, 7.0, 4.5, 8.5, 4)
    val ratio = coveredArea(small) / (1.5 * 1.5)
    assert(ratio <= 8.0, s"small-box covering must prune tightly, ratio=$ratio " +
      s"cells=${small.size}")
    // and the polygon covering must beat its own envelope (envelope covering
    // was the old behavior): pentagon area ≈ 3318 deg² vs envelope 5472 deg²
    val polyArea = coveredArea(polyCover)
    assert(polyArea < 5472 * 0.9,
      s"polygon covering must prune inside the envelope, area=$polyArea")
    // cell count stays bounded (the budget knob caps the boundary estimate;
    // diagonal edges can run past it by a small constant factor)
    assert(small.size <= 96 && polyCover.size <= 1024,
      s"coverings must stay bounded: ${small.size}, ${polyCover.size}")
  }

  test("cellBounds inverts geohash") {
    for ((lat, lon) <- Seq((0.0, 0.0), (42.25, -179.5), (-89.9, 179.9), (7.3, 3.2))) {
      val gh = Geo.geohash(lat, lon, 4)
      val (lo, la, hi, ha) = Geo.cellBounds(gh)
      assert(lon >= lo && lon < hi && lat >= la && lat < ha,
        s"($lat, $lon) outside bounds of its own cell $gh: ($lo, $la, $hi, $ha)")
    }
  }

  test("WKB point encode matches the OGC golden bytes and round-trips") {
    // POINT(1 2), NDR — the canonical example layout from OGC 99-049
    val golden = "0101000000000000000000f03f0000000000000040"
    assert(graft.functions.GeoWkb.encodePoint(1.0, 2.0)
      .map("%02x".format(_)).mkString == golden)
    val df = spark.range(1).select(
      Geo.stWkbX(Geo.stAsWkb(lit(-179.5), lit(42.25))).as("x"),
      Geo.stWkbY(Geo.stAsWkb(lit(-179.5), lit(42.25))).as("y"))
    val r = df.head()
    assert(r.getDouble(0) == -179.5 && r.getDouble(1) == 42.25)
  }

  test("WKB decode honors the XDR (big-endian) flag and rejects garbage") {
    val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0: Byte).putInt(1).putDouble(3.5).putDouble(-7.25)
    val xdr = buf.array()
    val s = spark
    import s.implicits._
    val df = Seq(xdr, Array[Byte](9, 9, 9), graft.functions.GeoWkb.encodePolygon(
        Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))))
      .toDF("wkb")
      .select(Geo.stWkbX(col("wkb")).as("x"), Geo.stWkbY(col("wkb")).as("y"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 3.5 && rows(0).getDouble(1) == -7.25)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1), "garbage must decode to null")
    assert(rows(2).isNullAt(0), "a polygon is not a point")
  }

  test("WKB polygon round-trips the outer ring") {
    val ring = Geo.parseWktPolygon(wkt)
    assert(graft.functions.GeoWkb.decodePolygonOuter(
      graft.functions.GeoWkb.encodePolygon(ring)) == ring)
  }

  test("driver-side GeoJSON polygon parse matches the expression parse") {
    val gj = """{"type":"Polygon","coordinates":[[[0,40],[38.5,12],[24,-32.25],[0,40]]]}"""
    assert(Geo.parseGeoJsonPolygon(gj)
      == Seq((0.0, 40.0), (38.5, 12.0), (24.0, -32.25), (0.0, 40.0)))
    val viaExpr = spark.range(1)
      .select(Geo.geoJsonPolygonOuter(lit(gj)).as("r")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(v => (v.getDouble(0), v.getDouble(1)))
    assert(Geo.parseGeoJsonPolygon(gj) == viaExpr)
    intercept[IllegalArgumentException](Geo.parseGeoJsonPolygon("""{"type":"Point"}"""))
  }

  test("GeoJSON point and polygon parse; wrong types yield null") {
    val df = spark.range(1).select(
      Geo.geoJsonPoint(Geo.asGeoJsonPoint(lit(12.5), lit(-3.75))).as("p"),
      Geo.geoJsonPoint(lit("""{"type":"Polygon","coordinates":[[[0,0]]]}""")).as("bad"),
      Geo.geoJsonPolygonOuter(
        lit("""{"type":"Polygon","coordinates":[[[0,40],[38,12],[0,40]]]}""")).as("ring"))
    val r = df.head()
    val p = r.getStruct(0)
    assert(p.getDouble(0) == 12.5 && p.getDouble(1) == -3.75)
    assert(r.isNullAt(1), "non-Point GeoJSON must parse to null")
    val ring = r.getSeq[org.apache.spark.sql.Row](2)
    assert(ring.map(v => (v.getDouble(0), v.getDouble(1)))
      == Seq((0.0, 40.0), (38.0, 12.0), (0.0, 40.0)))
  }
}
