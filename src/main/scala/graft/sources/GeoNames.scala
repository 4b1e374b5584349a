package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * GeoNames cities file source (S10) — the tab-delimited dump format of
 * cities15000.txt (reference `geo/CityLoader.java:31-86`): column 0 =
 * geoname id, 1 = name, 2 = ascii name, 4 = lat, 5 = lon, 8 = country
 * code, 14 = population. Malformed lines are skipped, matching the
 * reference's per-line catch-and-continue (try_cast, not cast — ANSI
 * CAST of a malformed string throws).
 */
object GeoNames {

  /** Degrees -> map units as a Column, bit-identical to
    * [[graft.geo.MapUnits.toMapUnit]] (half-unit correction toward
    * the sign, truncating cast). */
  def toMapUnitCol(deg: Column): Column = {
    val delta = 360.0 / (1 << 24) / 2
    when(deg > 0, ((deg + delta) * (1 << 24) / 360).cast("int"))
      .otherwise(((deg - delta) * (1 << 24) / 360).cast("int"))
  }

  /** geonames.org ships cities files as .zip (cities15000.zip); the
    * reference opens them through Utils.openFile (CityLoader.java:50),
    * selecting the entry matching the archive basename. Spark's csv
    * reader handles .gz/.bz2 by codec but not zip, so decode the entry
    * on the driver and hand the LINES to spark.read.csv — no temp file,
    * so this works on a real cluster where a driver-local path is
    * invisible to executors (the cities table is a few-MB broadcast
    * dimension; driver memory is the right place for it). */
  private def unzipLines(spark: SparkSession, path: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val zis = new java.util.zip.ZipInputStream(
      new java.io.BufferedInputStream(fs.open(hPath), 1 << 16))
    try {
      val base = hPath.getName
      val want = base.substring(0, base.length - 4)
      var e = zis.getNextEntry
      while (e != null && !e.getName.startsWith(want)) e = zis.getNextEntry
      if (e == null)
        throw new java.io.IOException(s"no entry starting with $want inside $base")
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(zis, java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(r.readLine()).takeWhile(_ != null).toVector
    } finally zis.close()
  }

  /**
   * Load a cities file: (city_id, city_name, country_code, population,
   * lat_mu, lon_mu). `useAsciiNames` mirrors the reference's
   * CityLoader(true) used for tile naming. Accepts the dump as plain
   * .txt, .gz/.bz2 (Spark codecs) or the distributed .zip form
   * (reference Utils.openFile parity).
   */
  def loadCities(spark: SparkSession, path: String,
                 useAsciiNames: Boolean = true): DataFrame = {
    val reader = spark.read
      .option("sep", "\t")
      .option("quote", "\u0000") // geonames is unquoted raw-tab format
    val raw =
      if (path.toLowerCase.endsWith(".zip")) {
        import spark.implicits._
        reader.csv(spark.createDataset(unzipLines(spark, path)))
      } else reader.csv(path)
    val lat = expr("try_cast(_c4 AS DOUBLE)")
    val lon = expr("try_cast(_c5 AS DOUBLE)")
    raw.select(
        expr("try_cast(_c0 AS BIGINT)").as("city_id"),
        (if (useAsciiNames) col("_c2") else col("_c1")).as("city_name"),
        col("_c8").as("country_code"),
        expr("try_cast(_c14 AS BIGINT)").as("population"),
        toMapUnitCol(lat).as("lat_mu"),
        toMapUnitCol(lon).as("lon_mu"))
      // skip-bad-lines semantics (CityLoader catches and logs per line)
      .where(col("city_id").isNotNull && col("population").isNotNull &&
        col("lat_mu").isNotNull && col("lon_mu").isNotNull)
  }

  /**
   * J6 tile naming over loaded cities: for each tile, the
   * highest-population contained city, named
   * `country_code + '-' + name` (reference
   * `AreaList.setAreaNames:272-298`; ties broken deterministically by
   * city_id — the reference's iteration order is list order, ours
   * must be stable). Returns (map_id, name).
   */
  def nameTiles(tilesDim: DataFrame, cities: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = tilesDim.join(broadcast(cities),
      col("lat_mu") >= col("t_min_lat") && col("lat_mu") <= col("t_max_lat") &&
        col("lon_mu") >= col("t_min_lon") && col("lon_mu") <= col("t_max_lon"))
    val w = Window.partitionBy(col("map_id"))
      .orderBy(col("population").desc, col("city_id"))
    joined.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("map_id"),
        concat(col("country_code"), lit("-"), col("city_name")).as("name"))
  }
}
