package graft.geo

/**
 * Fixed-point geographic coordinates: 1 map unit = 360 / 2^24 degrees.
 *
 * The whole engine does its geometry in integer map units so tile
 * boundaries are bit-exact and independent of float rounding, matching
 * the reference's quantization (reference: splitter
 * `Utils.java:60-76`, `RoundingUtils.java:29-88`).
 */
object MapUnits {
  /** Number of map units for a full 360 degrees. */
  final val FullCircle: Int = 1 << 24

  final val MinLat: Int = toMapUnit(-90.0)
  final val MaxLat: Int = toMapUnit(90.0)
  final val MinLon: Int = toMapUnit(-180.0)
  final val MaxLon: Int = toMapUnit(180.0)

  /** Degrees -> map units with half-unit rounding toward the sign. */
  def toMapUnit(degrees: Double): Int = {
    val delta = 360.0 / FullCircle / 2 // half a unit, corrects truncation
    if (degrees > 0) ((degrees + delta) * FullCircle / 360).toInt
    else ((degrees - delta) * FullCircle / 360).toInt
  }

  /** Map units -> degrees (exact). */
  def toDegrees(units: Int): Double = 360.0 * units / FullCircle

  /** Round down to a multiple of 2^shift (logical shift — negative
    * inputs wrap like the reference, only used on in-range coords). */
  def roundDown(v: Int, shift: Int): Int = v >>> shift << shift

  /** Round up to a multiple of 2^shift. */
  def roundUp(v: Int, shift: Int): Int =
    (v + (1 << shift) - 1) >>> shift << shift

  /** Round to the nearest multiple of 2^shift. */
  def roundNearest(v: Int, shift: Int): Int =
    (v + (1 << (shift - 1))) >>> shift << shift
}
