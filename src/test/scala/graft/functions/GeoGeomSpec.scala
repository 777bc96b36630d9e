package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.GeoGeom._

class GeoGeomSpec extends AnyFunSuite {

  private val wkts = Seq(
    "POINT(30 10)",
    "LINESTRING(30 10, 10 30, 40 40)",
    "POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))",
    "POLYGON((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT((10 40), (40 30), (20 20), (30 10))",
    "MULTILINESTRING((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    "MULTIPOLYGON(((30 20, 45 40, 10 40, 30 20)), ((15 5, 40 10, 10 20, 5 10, 15 5)))",
    "GEOMETRYCOLLECTION(POINT(40 10), LINESTRING(10 10, 20 20, 10 40), " +
      "POLYGON((40 40, 20 45, 45 30, 40 40)))")

  test("WKT -> geom -> WKB -> geom -> WKT round-trips all 7 OGC kinds") {
    wkts.foreach { w =>
      val g = parseWkt(w)
      val back = fromWkb(toWkb(g))
      assert(back == g, s"WKB round trip of $w")
      assert(parseWkt(toWkt(g)) == g, s"WKT render round trip of $w")
    }
  }

  test("big-endian WKB decodes (decoder honors the per-geometry flag)") {
    // hand-build an XDR point: flag 0, type 1, doubles big-endian
    val buf = java.nio.ByteBuffer.allocate(21)
    buf.put(0: Byte).putInt(1).putDouble(3.5).putDouble(-7.25)
    assert(fromWkb(buf.array()) == GPoint(3.5, -7.25))
  }

  test("point-in-multipolygon honors holes and disjoint shells") {
    val mp = parseWkt(
      "MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4)), " +
        "((20 0, 30 0, 30 10, 20 10, 20 0)))")
    assert(contains(mp, 2, 2), "in first shell")
    assert(!contains(mp, 5, 5), "inside the hole")
    assert(contains(mp, 25, 5), "in second shell")
    assert(!contains(mp, 15, 5), "between shells")
    // collection delegates to members
    val gc = parseWkt("GEOMETRYCOLLECTION(POINT(1 1), POLYGON((20 0, 30 0, 30 10, 20 10, 20 0)))")
    assert(contains(gc, 25, 5) && contains(gc, 1, 1) && !contains(gc, 2, 2))
  }

  test("centroids: area for polygons (holes subtract), length for lines") {
    assert(centroid(parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))")) == ((2.0, 2.0)))
    // symmetric hole keeps the centroid; mass shrinks
    val withHole = parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    val (cx, cy) = centroid(withHole)
    assert(math.abs(cx - 2.0) < 1e-12 && math.abs(cy - 2.0) < 1e-12)
    // off-center hole pushes the centroid away from the hole
    val (hx, _) = centroid(parseWkt(
      "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (0 1, 2 1, 2 3, 0 3, 0 1))"))
    assert(hx > 2.0, s"centroid must move away from the removed mass, got $hx")
    assert(centroid(parseWkt("LINESTRING(0 0, 0 2, 2 2)")) == ((0.5, 1.5)))
    assert(centroid(parseWkt("MULTIPOINT((0 0), (2 0), (1 3))")) == ((1.0, 1.0)))
  }

  test("SQL surface: st_geomfromtext/st_astext/st_contains_geom/st_distance_*") {
    val spark = TestSpark.spark
    val wkt = "MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4)))"
    val r = spark.sql(
      s"""SELECT st_astext(st_geomfromtext('$wkt')) AS rt,
         |  st_contains_geom(st_geomfromtext('$wkt'), CAST(2 AS DOUBLE), CAST(2 AS DOUBLE)) AS in1,
         |  st_contains_geom(st_geomfromtext('$wkt'), CAST(5 AS DOUBLE), CAST(5 AS DOUBLE)) AS in2,
         |  st_distance_centroid(st_geomfromtext('POINT(0 0)'),
         |                       st_geomfromtext('POINT(0 1)')) AS d,
         |  st_distance_between(st_geomfromtext('POINT(0 0)'),
         |                      st_geomfromtext('POINT(0 1)'), 100000.0, 120000.0) AS btw,
         |  st_distance_between(st_geomfromtext('POINT(0 0)'),
         |                      st_geomfromtext('POINT(0 1)'), 0.0, 50000.0) AS btw2
         |""".stripMargin).head()
    assert(parseWkt(r.getString(0)) == parseWkt(wkt))
    assert(r.getBoolean(1) && !r.getBoolean(2))
    // one degree of latitude ≈ 111.19 km = 111195 m (the reference's
    // metre unit, geo_search.test:238)
    assert(math.abs(r.getDouble(3) - 111195.1) < 10)
    assert(r.getBoolean(4) && !r.getBoolean(5))
  }
}
