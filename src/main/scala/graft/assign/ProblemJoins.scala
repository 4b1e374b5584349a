package graft.assign

import graft.geo.TileRect
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Joins for border-crossing ("problem") linked structures — the
 * reference's MultiTileProcessor machinery re-expressed as broadcast
 * theta-joins with integer-exact geometric predicates:
 *
 *  - J4: link-bbox x tile-rect intersection join
 *    (`MultiTileProcessor.checkBoundingBox:596-608`)
 *  - J5: segment x tile-rect crossing join
 *    (`MultiTileProcessor.addWritersOfCrossedTiles:669-675`)
 *  - J8: recursive membership closure over link->link references
 *    (`MultiTileProcessor.markProblemMembers:298-350`)
 *
 * All predicates are pure 64-bit integer arithmetic on map units
 * (cross products bounded by 2^50), so they evaluate identically in
 * any engine and stay inside whole-stage codegen.
 */
object ProblemJoins {

  /** Per-link bounding box from member point coordinates:
    * (link_id, min_lat, min_lon, max_lat, max_lon). */
  def linkBboxes(members: DataFrame): DataFrame =
    members.groupBy("link_id").agg(
      min(col("lat_mu")).as("min_lat"), min(col("lon_mu")).as("min_lon"),
      max(col("lat_mu")).as("max_lat"), max(col("lon_mu")).as("max_lon"))

  /** Closed rect-rect intersection predicate (shared edges count,
    * matching the engine's closed-boundary semantics). */
  def rectIntersects(aMinLat: Column, aMinLon: Column, aMaxLat: Column, aMaxLon: Column,
                     bMinLat: Column, bMinLon: Column, bMaxLat: Column, bMaxLon: Column): Column =
    aMinLat <= bMaxLat && aMaxLat >= bMinLat &&
      aMinLon <= bMaxLon && aMaxLon >= bMinLon

  /** J4: every (link, tile) pair whose bbox intersects the (padded)
    * tile rect. `tiles` is a small dimension — broadcast nested-loop
    * with the residual predicate, the canonical plan for an interval
    * join against a bounded build side. */
  def bboxTileJoin(bboxes: DataFrame, tiles: DataFrame): DataFrame =
    bboxes.join(broadcast(tiles),
      rectIntersects(
        col("min_lat"), col("min_lon"), col("max_lat"), col("max_lon"),
        col("t_min_lat"), col("t_min_lon"), col("t_max_lat"), col("t_max_lon")))
      .select(col("link_id"), col("map_id"))

  /**
   * Closed-rect x segment intersection, exact in integers:
   * bboxes must overlap AND the rect's four corners must not lie
   * strictly on one side of the segment's supporting line (min and
   * max corner cross-products straddle zero). Degenerate segments
   * reduce to point-in-rect.
   */
  def segmentIntersectsRect(x1: Column, y1: Column, x2: Column, y2: Column,
                            minLat: Column, minLon: Column,
                            maxLat: Column, maxLon: Column): Column = {
    val dx = (x2 - x1).cast("long")
    val dy = (y2 - y1).cast("long")
    def cross(cx: Column, cy: Column): Column =
      dx * (cy - y1).cast("long") - dy * (cx - x1).cast("long")
    val c1 = cross(minLon, minLat)
    val c2 = cross(minLon, maxLat)
    val c3 = cross(maxLon, minLat)
    val c4 = cross(maxLon, maxLat)
    val bboxOverlap =
      least(x1, x2) <= maxLon && greatest(x1, x2) >= minLon &&
        least(y1, y2) <= maxLat && greatest(y1, y2) >= minLat
    bboxOverlap && least(c1, c2, c3, c4) <= 0 && greatest(c1, c2, c3, c4) >= 0
  }

  /** J5: (segment, tile) crossing pairs. `segments` columns:
    * link_id, x1, y1, x2, y2 (consecutive member points, order
    * preserved from the member array — the span-order invariant). */
  def segmentTileJoin(segments: DataFrame, tiles: DataFrame): DataFrame =
    segments.join(broadcast(tiles),
      segmentIntersectsRect(col("x1"), col("y1"), col("x2"), col("y2"),
        col("t_min_lat"), col("t_min_lon"), col("t_max_lat"), col("t_max_lon")))
      .select(col("link_id"), col("map_id")).distinct()

  /**
   * O6: tile combinations whose union is an exact rectangle ("simple
   * neighbours"). A link whose member points all landed in tiles and
   * whose tile set is such a combination lies entirely inside one
   * convex rectangle, so its segments cannot cross any tile outside
   * the set — the segment theta-join can be elided for it (reference
   * `AreaDictionary.findSimpleNeigbours`, AreaDictionary.java:100-136,
   * consumed via `mayCross` at MultiTileProcessor.java:702-710).
   *
   * Returns sets of tile positions (indices into `tiles`), singletons
   * included; same guards as the reference: merged cardinality <= 10,
   * stop growing past `maxSets` combinations. Driver-side, O(pairs)
   * per fixpoint round over a list bounded by maxSets.
   */
  def simpleNeighbourSets(tiles: Seq[TileRect], maxCard: Int = 10,
                          maxSets: Int = 1000): Set[Set[Int]] = {
    val rects = scala.collection.mutable.ArrayBuffer.empty[(TileRect, Set[Int])]
    tiles.zipWithIndex.foreach { case (r, i) => rects += (r -> Set(i)) }
    val known = scala.collection.mutable.Set.empty[Set[Int]]
    var grew = true
    while (grew && known.size < maxSets) {
      grew = false
      val snap = rects.toVector
      for {
        i <- snap.indices
        j <- i + 1 until snap.size
      } {
        val (r1, s1) = snap(i)
        val (r2, s2) = snap(j)
        val sideBySide =
          (r1.minLat == r2.minLat && r1.maxLat == r2.maxLat &&
            (r1.minLon == r2.maxLon || r2.minLon == r1.maxLon)) ||
            (r1.minLon == r2.minLon && r1.maxLon == r2.maxLon &&
              (r1.minLat == r2.maxLat || r2.minLat == r1.maxLat))
        if (sideBySide && (s1 & s2).isEmpty) {
          val u = s1 ++ s2
          if (u.size <= maxCard && known.size < maxSets && !known.contains(u)) {
            known += u
            rects += (r1.union(r2) -> u)
            grew = true
          }
        }
      }
    }
    known.toSet ++ tiles.indices.map(Set(_))
  }

  /**
   * Keep-complete tile sets per link with the O6 elision: the union of
   * member-point tiles (J2) and segment-crossed tiles (J5), where the
   * segment join runs ONLY for links that may actually cross a border
   * — links fully inside a rectangle-forming tile combination are
   * anti-joined out of the segment side first.
   *
   * `members`: (link_id, doc_id, lat_mu, lon_mu) — one row per member
   * point. `segments`: (link_id, x1, y1, x2, y2). `tilesDim`:
   * (map_id, t_min_lat, t_min_lon, t_max_lat, t_max_lon) matching
   * `tileRects` positionally via `mapIds`.
   *
   * Elision is exact under closed-boundary point assignment: a member
   * point on the combination's outer border is also assigned to the
   * outside tile, which breaks the rectangle signature and routes the
   * link through the full segment join.
   */
  def keepCompleteTiles(members: DataFrame, segments: DataFrame,
                        tilesDim: DataFrame, tileRects: Seq[TileRect],
                        mapIds: Seq[Long]): DataFrame = {
    val memberTiles = memberTileJoin(members, tilesDim)
    val elidable = elidableLinks(members, memberTiles, tileRects, mapIds)
    val crossed = segmentTileJoin(
      segments.join(broadcast(elidable), Seq("link_id"), "left_anti"), tilesDim)
    memberTiles.select("link_id", "map_id").unionByName(crossed).distinct()
  }

  /** J2 point-in-tile containment join, keeping doc_id for the
    * all-members-matched check. */
  def memberTileJoin(members: DataFrame, tilesDim: DataFrame): DataFrame =
    members.join(broadcast(tilesDim),
        col("lat_mu") >= col("t_min_lat") && col("lat_mu") <= col("t_max_lat") &&
          col("lon_mu") >= col("t_min_lon") && col("lon_mu") <= col("t_max_lon"))
      .select(col("link_id"), col("doc_id"), col("map_id"))

  /** Links whose segment join can be elided (O6): every member point
    * matched at least one tile AND the matched tile set is a
    * rectangle-forming simple-neighbour combination. */
  def elidableLinks(members: DataFrame, memberTiles: DataFrame,
                    tileRects: Seq[TileRect], mapIds: Seq[Long]): DataFrame = {
    val perLink = memberTiles.groupBy("link_id").agg(
      count_distinct(col("doc_id")).as("n_matched"),
      sort_array(collect_set(col("map_id"))).as("tile_set"))
    val totals = members.groupBy("link_id")
      .agg(count_distinct(col("doc_id")).as("n_members"))
    val spark = members.sparkSession
    val simpleSets = simpleNeighbourSets(tileRects).toSeq
      .map(s => Tuple1(s.map(mapIds).toSeq.sorted))
    val simpleDf = spark.createDataFrame(simpleSets).toDF("tile_set")
    perLink.join(totals, "link_id")
      .where(col("n_matched") === col("n_members"))
      .join(broadcast(simpleDf), Seq("tile_set"), "left_semi")
      .select("link_id")
  }

  /**
   * J8: transitive membership closure. `edges` (parent_id, child_id)
   * may nest up to `maxDepth` levels (the reference caps at 15 and
   * detects loops the same way: iteration stops when no new pair
   * appears). Returns (root_id, leaf_id) for every reachable leaf.
   * Each round is one self-equi-join — a fixpoint of Dataset joins,
   * not a driver walk.
   */
  def membershipClosure(edges: DataFrame, maxDepth: Int = 15): DataFrame = {
    // Each round: frontier ⋈ edges, then anti-join against what is
    // already known — never exceptAll over the whole closure — and
    // localCheckpoint the (small) per-round delta so lineage stays
    // flat across rounds. The closure itself is only materialized as
    // the union of checkpointed deltas, so no round rewrites it.
    val e = edges.select(col("parent_id"), col("child_id"))
      .localCheckpoint(true)
    val first = e
      .select(col("parent_id").as("root_id"), col("child_id").as("leaf_id"))
      .distinct().localCheckpoint(true)
    val deltas = scala.collection.mutable.ArrayBuffer(first)
    var frontier = first
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      val next = frontier
        .join(e.withColumnRenamed("parent_id", "leaf_id"), "leaf_id")
        .select(col("root_id"), col("child_id").as("leaf_id"))
        .distinct()
      val known = deltas.reduce(_ unionByName _)
      val newPairs = next
        .join(known, Seq("root_id", "leaf_id"), "left_anti")
        .localCheckpoint(true)
      frontier = newPairs
      if (!newPairs.isEmpty) { deltas += newPairs; depth += 1 }
    }
    deltas.reduce(_ unionByName _)
  }
}
