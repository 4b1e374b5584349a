package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic document-id -> (lat, lon) synthesis in map units.
 *
 * The corpus carries no real coordinates, so the density surface is
 * derived from the numeric document id with pure 64-bit integer
 * arithmetic (LCG mixes + modulo) that evaluates identically in Spark
 * SQL and in the DuckDB oracle — no engine-specific hash functions.
 * The surface is 12 pseudo-random clusters plus a 25% uniform
 * background over a +-60 lat x +-120 lon window, enough structure to
 * exercise empty-cluster carving, skew and the BSP terminal cases.
 *
 * Every intermediate stays non-negative and far below 2^63, so `%`
 * and overflow behavior agree across engines (Spark 4 runs ANSI mode:
 * overflow would throw, not wrap).
 */
object CoordSynthesis {
  val LatMin: Int = MapUnits.toMapUnit(-60.0)
  val LatMax: Int = MapUnits.toMapUnit(60.0)
  val LonMin: Int = MapUnits.toMapUnit(-120.0)
  val LonMax: Int = MapUnits.toMapUnit(120.0)
  val LatRange: Int = LatMax - LatMin
  val LonRange: Int = LonMax - LonMin
  /** Cluster window size in map units (~5.6 degrees). */
  val Spread: Int = 1 << 18
  val NumClusterSlots = 16
  val NumClusters = 12 // slots >= 12 fall through to uniform background

  // LCG-style mixing constants (classic public-domain PRNG multipliers)
  private val A1 = 1103515245L
  private val C1 = 12345L
  private val A2 = 69069L
  private val C2 = 362437L
  private val M = 1L << 31
  private val CA = 2654435761L // Knuth multiplicative hash
  private val CB = 2246822519L
  private val CC = 40503L
  private val CD = 89917L

  /** Driver-side scalar version — the test oracle. */
  def latLonOf(id: Long): (Int, Int) = {
    require(id >= 0, "ids must be non-negative")
    val c = id % NumClusterSlots
    val h1 = (id * A1 + C1) % M
    val h2 = (id * A2 + C2) % M
    if (c < NumClusters) {
      val cLat = LatMin + Spread / 2 + ((c * CA + CC) % (LatRange - Spread))
      val cLon = LonMin + Spread / 2 + ((c * CB + CD) % (LonRange - Spread))
      ((cLat - Spread / 2 + h1 % Spread).toInt, (cLon - Spread / 2 + h2 % Spread).toInt)
    } else {
      ((LatMin + h1 % LatRange).toInt, (LonMin + h2 % LonRange).toInt)
    }
  }

  /** Spark column for the latitude in map units of a numeric id column. */
  def latCol(id: Column): Column = {
    val c = id % NumClusterSlots
    val h1 = (id * A1 + C1) % M
    val cLat = lit(LatMin) + lit(Spread / 2) + (c * CA + CC) % (LatRange - Spread)
    when(c < NumClusters, cLat - Spread / 2 + h1 % Spread)
      .otherwise(lit(LatMin) + h1 % LatRange)
      .cast("int")
  }

  /** Spark column for the longitude in map units of a numeric id column. */
  def lonCol(id: Column): Column = {
    val c = id % NumClusterSlots
    val h2 = (id * A2 + C2) % M
    val cLon = lit(LonMin) + lit(Spread / 2) + (c * CB + CD) % (LonRange - Spread)
    when(c < NumClusters, cLon - Spread / 2 + h2 % Spread)
      .otherwise(lit(LonMin) + h2 % LonRange)
      .cast("int")
  }

  /** ANSI SQL (DuckDB-compatible) text of the same latitude formula,
    * over the id expression `idExpr`. */
  def latSql(idExpr: String): String = {
    val c = s"(($idExpr) % $NumClusterSlots)"
    val h1 = s"((($idExpr) * $A1 + $C1) % $M)"
    val cLat = s"($LatMin + ${Spread / 2} + ($c * $CA + $CC) % ${LatRange - Spread})"
    s"(CASE WHEN $c < $NumClusters THEN $cLat - ${Spread / 2} + $h1 % $Spread " +
      s"ELSE $LatMin + $h1 % $LatRange END)"
  }

  def lonSql(idExpr: String): String = {
    val c = s"(($idExpr) % $NumClusterSlots)"
    val h2 = s"((($idExpr) * $A2 + $C2) % $M)"
    val cLon = s"($LonMin + ${Spread / 2} + ($c * $CB + $CD) % ${LonRange - Spread})"
    s"(CASE WHEN $c < $NumClusters THEN $cLon - ${Spread / 2} + $h2 % $Spread " +
      s"ELSE $LonMin + $h2 % $LonRange END)"
  }
}
