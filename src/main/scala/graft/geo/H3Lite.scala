package graft.geo

/**
 * "H3-lite": a hierarchical 64-bit cell index over map-unit
 * coordinates — the engine's stand-in for H3 res-7 / S2 level-12
 * cells, with the operations the pipeline needs (encode, parent,
 * decode, k-ring) but a rectangular Z-order (Morton) layout so cell
 * edges coincide exactly with the splitter grid at the same
 * resolution: cellId bits = [4 res][48 interleaved lon/lat].
 *
 * Layout per resolution r (0..24): lat+2^23 and lon+2^23 are 24-bit
 * non-negative; their top r bits are interleaved (lon even positions,
 * lat odd). Parent at r-1 = drop the lowest bit pair. This keeps the
 * index hierarchical (prefix property) like H3/S2 without the
 * hexagonal neighbor math.
 */
object H3Lite {
  final val MaxRes = 24

  def encode(latMu: Int, lonMu: Int, res: Int): Long = {
    require(res >= 0 && res <= MaxRes, s"bad resolution $res")
    val latN = (latMu + (1 << 23)) & 0xffffff
    val lonN = (lonMu + (1 << 23)) & 0xffffff
    val latBits = latN >>> (24 - res)
    val lonBits = lonN >>> (24 - res)
    var cell = 0L
    var i = 0
    while (i < res) {
      cell |= ((lonBits >>> i) & 1L) << (2 * i)
      cell |= ((latBits >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    (res.toLong << 58) | cell
  }

  def resolutionOf(cell: Long): Int = (cell >>> 58).toInt

  /** Parent cell at `parentRes` <= res (prefix truncation). */
  def parent(cell: Long, parentRes: Int): Long = {
    val res = resolutionOf(cell)
    require(parentRes <= res, s"parent res $parentRes above cell res $res")
    val body = cell & ((1L << 58) - 1)
    (parentRes.toLong << 58) | (body >>> (2 * (res - parentRes)))
  }

  /** (minLat, minLon) map units of the cell's south-west corner. */
  def decode(cell: Long): (Int, Int) = {
    val res = resolutionOf(cell)
    var latBits = 0
    var lonBits = 0
    var i = 0
    while (i < res) {
      lonBits |= (((cell >>> (2 * i)) & 1L) << i).toInt
      latBits |= (((cell >>> (2 * i + 1)) & 1L) << i).toInt
      i += 1
    }
    ((latBits << (24 - res)) - (1 << 23), (lonBits << (24 - res)) - (1 << 23))
  }

  /** Cell edge length in map units. */
  def cellSize(res: Int): Int = 1 << (24 - res)

  /** Cells within Chebyshev distance k (the (2k+1)^2 block) — the
    * ring expansion used by nearest-tile fallback search. */
  def kRing(cell: Long, k: Int): Seq[Long] = {
    val res = resolutionOf(cell)
    val (lat, lon) = decode(cell)
    val sz = cellSize(res)
    for {
      dy <- -k to k
      dx <- -k to k
      la = lat + dy * sz
      lo = lon + dx * sz
      if la >= -(1 << 23) && la < (1 << 23) && lo >= -(1 << 23) && lo < (1 << 23)
    } yield encode(la, lo, res)
  }
}
