package graft.geo

/**
 * An axis-aligned rectangle in map units, closed on all four edges.
 *
 * `contains` is deliberately closed (`<= max`) so that a point lying
 * exactly on a shared tile border belongs to BOTH adjacent tiles —
 * the reference's duplication semantics (splitter `Area.java:175-180`),
 * which downstream row-count oracles depend on.
 *
 * @param minLat south edge  @param minLon west edge
 * @param maxLat north edge  @param maxLon east edge
 */
final case class TileRect(minLat: Int, minLon: Int, maxLat: Int, maxLon: Int) {
  def width: Int = maxLon - minLon
  def height: Int = maxLat - minLat
  def isEmpty: Boolean = width <= 0 || height <= 0

  def contains(lat: Int, lon: Int): Boolean =
    lat >= minLat && lat <= maxLat && lon >= minLon && lon <= maxLon

  def containsRect(o: TileRect): Boolean =
    o.minLat >= minLat && o.maxLat <= maxLat &&
      o.minLon >= minLon && o.maxLon <= maxLon

  /** Touching edges count as intersecting (closed semantics). */
  def intersects(o: TileRect): Boolean =
    minLat <= o.maxLat && maxLat >= o.minLat &&
      minLon <= o.maxLon && maxLon >= o.minLon

  /** Strict interior overlap (shared edges do NOT count). */
  def overlaps(o: TileRect): Boolean =
    minLat < o.maxLat && maxLat > o.minLat &&
      minLon < o.maxLon && maxLon > o.minLon

  def union(o: TileRect): TileRect = TileRect(
    math.min(minLat, o.minLat), math.min(minLon, o.minLon),
    math.max(maxLat, o.maxLat), math.max(maxLon, o.maxLon))

  def intersection(o: TileRect): Option[TileRect] = {
    val r = TileRect(
      math.max(minLat, o.minLat), math.max(minLon, o.minLon),
      math.min(maxLat, o.maxLat), math.min(maxLon, o.maxLon))
    if (r.isEmpty) None else Some(r)
  }

  /** Pad on all sides by `overlap` map units, clamped to the legal
    * coordinate range (splitter's `--overlap`,
    * `AreaDictionary.java:169-177`). */
  def extended(overlap: Int): TileRect = TileRect(
    math.max(minLat - overlap, MapUnits.MinLat),
    math.max(minLon - overlap, MapUnits.MinLon),
    math.min(maxLat + overlap, MapUnits.MaxLat),
    math.min(maxLon + overlap, MapUnits.MaxLon))

  /** Align edges outward to multiples of 2^(24-resolution), clamping
    * latitude to ±85° to avoid polar pathology
    * (reference `RoundingUtils.java:63-88`). */
  def roundedTo(resolution: Int): TileRect = {
    val shift = 24 - resolution
    val lat0 = math.max(minLat, MapUnits.toMapUnit(-85.0))
    val lat1 = math.min(maxLat, MapUnits.toMapUnit(85.0))
    var lon0 = MapUnits.roundDown(minLon, shift)
    var lon1 = MapUnits.roundUp(maxLon, shift)
    if (lon0 < -0x800000) lon0 = -0x800000
    if (lon1 > 0x800000) lon1 = 0x800000
    TileRect(MapUnits.roundDown(lat0, shift), lon0,
      MapUnits.roundUp(lat1, shift), lon1)
  }

  def verify: Boolean =
    minLat <= maxLat && minLon <= maxLon &&
      minLon >= MapUnits.MinLon && maxLon <= MapUnits.MaxLon &&
      minLat >= MapUnits.MinLat && maxLat <= MapUnits.MaxLat

  override def toString: String =
    s"(${MapUnits.toDegrees(minLat)},${MapUnits.toDegrees(minLon)}) to " +
      s"(${MapUnits.toDegrees(maxLat)},${MapUnits.toDegrees(maxLon)})"
}

object TileRect {
  /** Degenerate dimensions are widened by one unit like the reference
    * constructor (`Area.java:55-76`). */
  def nonDegenerate(minLat: Int, minLon: Int, maxLat: Int, maxLon: Int): TileRect =
    TileRect(minLat, minLon,
      if (maxLat == minLat) minLat + 1 else maxLat,
      if (maxLon == minLon) minLon + 1 else maxLon)

  val Planet: TileRect =
    TileRect(MapUnits.MinLat, MapUnits.MinLon, MapUnits.MaxLat, MapUnits.MaxLon)
}
