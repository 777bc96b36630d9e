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
}
