package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Geo

class SaltingSpec extends AnyFunSuite {

  test("salted join equals the plain join on skewed data") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 999, i)).toDF("k", "v")
    val right = (0 to 1000).map(i => (i, s"r$i")).toDF("k", "payload")
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = Salting.saltedJoin(left, right, "k", salts = 8).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    // and the scatter really spreads the hot key
    val saltSpread = left.withColumn("__salt",
        pmod(hash(left.columns.map(col).toSeq: _*), lit(8)))
      .filter(col("k") === 999)
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(saltSpread >= 6, s"hot key spread over $saltSpread salts")
  }

  test("geohash goldens and bbox covering contains all member cells") {
    // goldens from the public geohash definition
    assert(Geo.geohash(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(Geo.geohash(0.0, 0.0, 5) == "s0000")
    val cells = Geo.coverBox(-10, -10, 10, 10, 2)
    // every point in the box must hash into a covered cell
    val probes = for (lat <- -10 to 10 by 2; lon <- -10 to 10 by 2)
      yield Geo.geohash(lat, lon, 2)
    assert(probes.toSet.subsetOf(cells.toSet))
  }
}
