package graft

import graft.geo.MapUnits
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference's OWN unit-test vectors, replayed against this
 * engine's counterparts — a user of the reference switching engines
 * gets the exact answers its test suite pins:
 *
 *  - `RoundingTest.java` (all vectors, including the negative
 *    wrap-around and Integer.MIN_VALUE cases) vs [[MapUnits]];
 *  - `geo/CityFinderTest.java` (the bbox city queries with their
 *    expected hit sets) vs the closed containment join
 *    [[graft.sources.GeoNames.nameTiles]] is built on.
 */
class ReferenceVectorsSpec extends AnyFunSuite {

  test("RoundingTest.testPositiveRoundingDown vectors") {
    for (i <- 0 until 50000 by 19)
      assert(MapUnits.roundDown(i, 11) === i / 2048 * 2048)
    assert(MapUnits.roundDown(0x1d5842, 11) === 0x1d5800)
    assert(MapUnits.roundDown(0x2399a, 11) === 0x23800)
    assert(MapUnits.roundDown(0x23800, 11) === 0x23800)
    assert(MapUnits.roundDown(0x237f0, 11) === 0x23000)
  }

  test("RoundingTest.testPositiveRoundingUp vectors") {
    for (i <- 0 until 50000 by 19)
      assert(MapUnits.roundUp(i, 11) === (i + 2047) / 2048 * 2048)
    assert(MapUnits.roundUp(0x1e7faa, 11) === 0x1e8000)
    assert(MapUnits.roundUp(0x1e7801, 11) === 0x1e8000)
    assert(MapUnits.roundUp(0x1e7800, 11) === 0x1e7800)
    assert(MapUnits.roundUp(0x1e70aa, 11) === 0x1e7800)
    assert(MapUnits.roundUp(0x1e77ff, 11) === 0x1e7800)
  }

  test("RoundingTest negative rounding vectors (wrap semantics)") {
    assert(MapUnits.roundDown(0xffcbba86, 11) === 0xffcbb800)
    assert(MapUnits.roundDown(0xffcbbfff, 11) === 0xffcbb800)
    assert(MapUnits.roundDown(0xffcbb801, 11) === 0xffcbb800)
    assert(MapUnits.roundDown(0xffcbb7ff, 11) === 0xffcbb000)
    assert(MapUnits.roundUp(0xffcbba86, 11) === 0xffcbc000)
    assert(MapUnits.roundUp(0xffcbbfff, 11) === 0xffcbc000)
    assert(MapUnits.roundUp(0xffcbb801, 11) === 0xffcbc000)
    assert(MapUnits.roundUp(0xffcbb7ff, 11) === 0xffcbb800)
    assert(MapUnits.roundUp(Int.MinValue + 1234, 11) === 0x80000800)
  }

  test("RoundingTest.testRound vectors") {
    val vectors = Seq(
      (7, 8), (6, 8), (5, 4), (4, 4), (3, 4), (2, 4), (1, 0), (0, 0),
      (-1, 0), (-2, 0), (-3, -4), (-4, -4), (-5, -4))
    vectors.foreach { case (v, want) =>
      assert(MapUnits.roundNearest(v, 2) === want, s"round($v, 2)")
    }
  }

  test("CityFinderTest.testFinder vectors through the containment join") {
    lazy val spark: SparkSession = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    // the reference's five test cities: (id, code, name, lat, lon, pop)
    val cities = Seq(
      (2L, "EF", "Efefef", 10L, 10L, 100000L),
      (1L, "CD", "Cdcdcd", 10L, 10L, 100000L),
      (4L, "IJ", "Ijijij", 12L, 11L, 100000L),
      (3L, "GH", "Ghghgh", -2L, 10L, 100000L),
      (0L, "AB", "Ababab", 10L, -1L, 100000L))
      .toDF("city_id", "country_code", "city_name", "lat_mu", "lon_mu",
        "population")
    // findCities(minLat, minLong, maxLat, maxLong) — the same closed
    // predicate GeoNames.nameTiles joins on
    def find(minLat: Long, minLon: Long, maxLat: Long, maxLon: Long): Set[Long] =
      cities.where(
          col("lat_mu") >= minLat && col("lat_mu") <= maxLat &&
            col("lon_mu") >= minLon && col("lon_mu") <= maxLon)
        .select("city_id").collect().map(_.getLong(0)).toSet
    assert(find(10, 10, 10, 10).size === 2) // the two cities at (10,10)
    assert(find(10, -10, 12, 0) === Set(0L)) // only AB at (10,-1)
    assert(find(10, -10, 12, -4) === Set.empty[Long])
  }
}
