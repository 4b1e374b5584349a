package graft

import graft.geo.{MapUnits, TileRect}
import graft.sources.{GeoNames, PrecompSea}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/**
 * S9/S10 sources: the geonames cities15000 TSV reader
 * (reference `geo/CityLoader.java`) and the precompiled-sea directory
 * reader (reference `solver/PrecompSeaReader.java`).
 */
class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def col16(id: Int, name: String, ascii: String, lat: Double,
                    lon: Double, cc: String, pop: Long): String = {
    val cols = Array.fill(16)("")
    cols(0) = id.toString; cols(1) = name; cols(2) = ascii
    cols(4) = lat.toString; cols(5) = lon.toString
    cols(8) = cc; cols(14) = pop.toString
    cols.mkString("\t")
  }

  test("geonames loader: format, map-unit parity, bad-line skip") {
    val dir = Files.createTempDirectory("geonames").toString
    val f = s"$dir/cities15000.txt"
    Files.writeString(Paths.get(f), Seq(
      col16(1, "München", "Munich", 48.1374, 11.5755, "DE", 1260391L),
      col16(2, "Paris", "Paris", 48.8534, 2.3488, "FR", 2138551L),
      "garbage line without enough tabs",
      col16(3, "BadPop", "BadPop", 1.0, 2.0, "XX", 7L)
        .replace("\t7", "\tnot_a_number"),
      col16(4, "Lima", "Lima", -12.0432, -77.0282, "PE", 7737002L))
      .mkString("\n"))
    val cities = GeoNames.loadCities(spark, f).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(cities.keySet === Set(1L, 2L, 4L), "bad lines must be skipped")
    assert(cities(1L).getString(1) === "Munich", "ascii name by default")
    assert(cities(1L).getString(2) === "DE")
    assert(cities(1L).getLong(3) === 1260391L)
    // bit-identical to the driver-side conversion, negatives included
    assert(cities(1L).getInt(4) === MapUnits.toMapUnit(48.1374))
    assert(cities(1L).getInt(5) === MapUnits.toMapUnit(11.5755))
    assert(cities(4L).getInt(4) === MapUnits.toMapUnit(-12.0432))
    assert(cities(4L).getInt(5) === MapUnits.toMapUnit(-77.0282))
    // non-ascii variant keeps the original name
    val raw = GeoNames.loadCities(spark, f, useAsciiNames = false)
      .where(col("city_id") === 1).collect()(0)
    assert(raw.getString(1) === "München")
  }

  test("geonames loader reads the distributed .zip form like the reference") {
    val dir = Files.createTempDirectory("geonames_zip").toString
    val txt = Seq(
      col16(1, "München", "Munich", 48.1374, 11.5755, "DE", 1260391L),
      col16(2, "Lima", "Lima", -12.0432, -77.0282, "PE", 7737002L))
      .mkString("\n")
    val zipPath = s"$dir/cities15000.zip"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    zos.write("not the data".getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("cities15000.txt"))
    zos.write(txt.getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    val cities = GeoNames.loadCities(spark, zipPath).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(cities.keySet === Set(1L, 2L))
    assert(cities(1L).getString(1) === "Munich")
    assert(cities(2L).getInt(4) === MapUnits.toMapUnit(-12.0432))
    // archives without a matching entry fail loudly (Utils.java:108-113)
    val badZip = s"$dir/other.zip"
    val z2 = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(badZip))
    z2.putNextEntry(new java.util.zip.ZipEntry("unrelated.txt"))
    z2.write(txt.getBytes("UTF-8")); z2.closeEntry(); z2.close()
    intercept[java.io.IOException](GeoNames.loadCities(spark, badZip).collect())
  }

  test("geonames tile naming picks top population with CC- prefix") {
    import spark.implicits._
    val tiles = Seq((100L, 0L, 0L, 1000L, 1000L), (200L, 0L, 1000L, 1000L, 2000L))
      .toDF("map_id", "t_min_lat", "t_min_lon", "t_max_lat", "t_max_lon")
    val cities = Seq(
      (1L, "Smallville", "AA", 10L, 500, 500),
      (2L, "Bigville", "BB", 99L, 600, 600),
      (3L, "Otherville", "CC", 5L, 500, 1500))
      .toDF("city_id", "city_name", "country_code", "population", "lat_mu", "lon_mu")
    val names = GeoNames.nameTiles(tiles, cities).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(names === Map(100L -> "BB-Bigville", 200L -> "CC-Otherville"))
  }

  test("precomp-sea raster arithmetic matches the reference exactly") {
    val r = PrecompSea.Raster
    assert(PrecompSea.tileStart(0) === 0)
    assert(PrecompSea.tileStart(r) === r)
    assert(PrecompSea.tileStart(r + 1) === r)
    assert(PrecompSea.tileEnd(r + 1) === 2 * r)
    // the reference's negative branch: value - RASTER - rem
    assert(PrecompSea.tileStart(-1) === -r)
    assert(PrecompSea.tileStart(-r) === -r)
    assert(PrecompSea.tileStart(-r - 1) === -2 * r)
    assert(PrecompSea.tileEnd(-1) === 0)
    assert(PrecompSea.tileEnd(-r) === -r)
  }

  test("precomp-sea index: classify, enumerate, read mixed tiles") {
    import spark.implicits._
    val r = PrecompSea.Raster
    val dir = Files.createTempDirectory("precomp_sea").toString
    // one mixed tile at (0,0) with two coastline points; sea E, land N
    Seq((100, 200), (300, 400)).toDF("lat_mu", "lon_mu")
      .coalesce(1).write.parquet(s"$dir/sea_0_0.pbf.parquet")
    Files.writeString(Paths.get(s"$dir/index.txt"), Seq(
      "# comment line",
      s"0_0;sea_0_0.pbf.parquet",
      s"0_$r;sea",
      s"${r}_0;land").mkString("\n"))

    val idx = PrecompSea.loadIndex(dir)
    assert(idx.prefix === "sea_" && idx.ext === ".pbf.parquet")
    assert(PrecompSea.classify(idx, 10, 10) === Some(PrecompSea.MixedTile("sea_0_0.pbf.parquet")))
    assert(PrecompSea.classify(idx, 10, r + 10) === Some(PrecompSea.SeaTile))
    assert(PrecompSea.classify(idx, r + 10, 10) === Some(PrecompSea.LandTile))
    assert(PrecompSea.classify(idx, -10, 10) === None)

    val bounds = TileRect(0, 0, 2 * r, 2 * r)
    assert(PrecompSea.mixedTileFiles(idx, bounds) === Seq("sea_0_0.pbf.parquet"))
    val pts = PrecompSea.readSeaPoints(spark, dir, bounds)
      .collect().map(rr => (rr.getInt(0), rr.getInt(1))).toSet
    assert(pts === Set((100, 200), (300, 400)))
    // no mixed tile in range -> empty frame, same schema
    val none = PrecompSea.readSeaPoints(spark, dir, TileRect(4 * r, 4 * r, 5 * r, 5 * r))
    assert(none.count() === 0)
    assert(none.columns.toSeq === Seq("lat_mu", "lon_mu"))
  }

  test("precomp-sea index rejects what the reference rejects") {
    val dir = Files.createTempDirectory("precomp_bad").toString
    intercept[IllegalArgumentException](PrecompSea.loadIndex(dir)) // no index
    Files.writeString(Paths.get(s"$dir/index.txt"), "not-a-valid-line")
    intercept[IllegalArgumentException](PrecompSea.loadIndex(dir))
    // inconsistent file-name scheme across mixed tiles
    Files.writeString(Paths.get(s"$dir/index.txt"),
      "0_0;sea_0_0.pbf\n32768_0;other_32768_0.xyz")
    intercept[IllegalArgumentException](PrecompSea.loadIndex(dir))
  }
}
