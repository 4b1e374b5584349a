package graft

import graft.assign.ProblemJoins
import graft.geo.{CoordSynthesis, TileRect}
import graft.queries.FixedTiles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * O6 simple-neighbour elision (reference AreaDictionary.java:100-136):
 * the keep-complete segment join is skipped for links whose member
 * tiles form a rectangle, without changing the result.
 */
class KeepCompleteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def points: DataFrame = {
    val id = col("doc_id")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        CoordSynthesis.latCol(id).cast("long").as("lat_mu"),
        CoordSynthesis.lonCol(id).cast("long").as("lon_mu"))
  }
  private def members: DataFrame =
    points.withColumn("link_id", expr("doc_id div 5"))
  private def segments: DataFrame = {
    val p1 = points.select(col("doc_id").as("id1"),
      col("lon_mu").as("x1"), col("lat_mu").as("y1"))
    val p2 = points.select(col("doc_id").as("id2"),
      col("lon_mu").as("x2"), col("lat_mu").as("y2"))
    p1.where(expr("id1 % 5 < 4"))
      .join(p2, col("id2") === col("id1") + 1)
      .select(expr("id1 div 5").as("link_id"),
        col("x1"), col("y1"), col("x2"), col("y2"))
  }
  private def tilesDf: DataFrame = {
    import spark.implicits._
    FixedTiles.rects.zipWithIndex.map { case (r, i) =>
      (FixedTiles.StartMapId + i.toLong, r.minLat.toLong, r.minLon.toLong,
        r.maxLat.toLong, r.maxLon.toLong)
    }.toDF("map_id", "t_min_lat", "t_min_lon", "t_max_lat", "t_max_lon")
  }
  private val mapIds: Seq[Long] =
    FixedTiles.rects.indices.map(i => (FixedTiles.StartMapId + i).toLong)

  // independent reference implementations: the broadcast theta-joins
  // the cell-bucketed probes replaced — the probe path must produce
  // exactly these pairs
  private def naiveMemberTileJoin(m: DataFrame, tiles: DataFrame): DataFrame =
    m.join(broadcast(tiles),
        col("lat_mu") >= col("t_min_lat") && col("lat_mu") <= col("t_max_lat") &&
          col("lon_mu") >= col("t_min_lon") && col("lon_mu") <= col("t_max_lon"))
      .select(col("link_id"), col("doc_id"), col("map_id"))
  private def naiveSegmentTileJoin(segs: DataFrame, tiles: DataFrame): DataFrame =
    segs.join(broadcast(tiles),
        ProblemJoins.segmentIntersectsRect(col("x1"), col("y1"), col("x2"), col("y2"),
          col("t_min_lat"), col("t_min_lon"), col("t_max_lat"), col("t_max_lon")))
      .select(col("link_id"), col("map_id")).distinct()

  test("simpleNeighbourSets: exactly the rectangle-forming combos of a 3x2 grid") {
    // grid layout: row 0 = tiles 0,1,2 (south), row 1 = tiles 3,4,5
    val sets = ProblemJoins.simpleNeighbourSets(FixedTiles.rects)
    val expectedMerged = Set(
      Set(0, 1), Set(1, 2), Set(3, 4), Set(4, 5), // horizontal pairs
      Set(0, 3), Set(1, 4), Set(2, 5), // vertical pairs
      Set(0, 1, 2), Set(3, 4, 5), // full rows
      Set(0, 1, 3, 4), Set(1, 2, 4, 5), // 2x2 squares
      Set(0, 1, 2, 3, 4, 5)) // whole grid
    val singletons = (0 until 6).map(Set(_)).toSet
    expectedMerged.foreach(s => assert(sets.contains(s), s"missing $s"))
    singletons.foreach(s => assert(sets.contains(s), s"missing singleton $s"))
    // no L-shapes or gapped combos
    assert(!sets.contains(Set(0, 1, 3)))
    assert(!sets.contains(Set(0, 2)))
    assert(sets === expectedMerged ++ singletons)
  }

  test("elision preserves the keep-complete result and skips >0 links") {
    val elided = ProblemJoins.keepCompleteTiles(
      members, segments, FixedTiles.rects, mapIds)
    val naive = naiveMemberTileJoin(members, tilesDf)
      .select(col("link_id"), col("map_id"))
      .unionByName(naiveSegmentTileJoin(segments, tilesDf))
      .distinct()
    assert(elided.exceptAll(naive).isEmpty && naive.exceptAll(elided).isEmpty,
      "O6 elision must not change the keep-complete tile sets")

    val memberTiles = ProblemJoins.memberTileJoin(members, FixedTiles.rects, mapIds)
    assert(memberTiles.exceptAll(naiveMemberTileJoin(members, tilesDf)).isEmpty &&
      naiveMemberTileJoin(members, tilesDf).exceptAll(memberTiles).isEmpty,
      "probe member join must equal the predicate join")
    val nElidable = ProblemJoins
      .elidableLinks(members, memberTiles, FixedTiles.rects, mapIds)
      .count()
    val nLinks = members.select("link_id").distinct().count()
    assert(nElidable > 0, "the fixture must exercise the elision path")
    // the skipped links translate into fewer segment-join input rows
    val segTotal = segments.count()
    val segAfter = segments
      .join(ProblemJoins.elidableLinks(members, memberTiles,
        FixedTiles.rects, mapIds), Seq("link_id"), "left_anti")
      .count()
    assert(segAfter < segTotal,
      s"elision must reduce segment-join input ($nElidable/$nLinks links elidable)")
  }

  test("elision is exact on boundary-heavy random links (property)") {
    // a 3x3 grid with many points EXACTLY on shared tile edges — the
    // closed-boundary duplication is what makes the elision exact, so
    // hammer that case specifically
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val grid = for (r <- 0 until 3; c <- 0 until 3)
      yield TileRect(r * 1000, c * 1000, (r + 1) * 1000, (c + 1) * 1000)
    val ids = grid.indices.map(i => 100L + i)
    val tiles = grid.zipWithIndex.map { case (t, i) =>
      (100L + i, t.minLat.toLong, t.minLon.toLong, t.maxLat.toLong, t.maxLon.toLong)
    }.toDF("map_id", "t_min_lat", "t_min_lon", "t_max_lat", "t_max_lon")
    // 300 links x 4 members; half the coordinates snap to edge multiples
    val pts = (0 until 1200).map { i =>
      def coord() = {
        val v = rnd.nextInt(3001)
        if (rnd.nextBoolean()) (v / 1000) * 1000 else v // snap half to edges
      }
      (i.toLong, coord().toLong, coord().toLong, (i / 4).toLong)
    }
    val members = pts.toDF("doc_id", "lat_mu", "lon_mu", "link_id")
    val segs = pts.sliding(2).toSeq
      .filter { case Seq(a, b) => a._4 == b._4; case _ => false }
      .map { case Seq(a, b) => (a._4, a._3, a._2, b._3, b._2) }
      .toDF("link_id", "x1", "y1", "x2", "y2")
    val elided = ProblemJoins.keepCompleteTiles(members, segs, grid, ids)
    val naive = naiveMemberTileJoin(members, tiles)
      .select(col("link_id"), col("map_id"))
      .unionByName(naiveSegmentTileJoin(segs, tiles))
      .distinct()
    assert(elided.exceptAll(naive).isEmpty && naive.exceptAll(elided).isEmpty,
      "boundary-heavy elision must be exact")
    val segCross = ProblemJoins.segmentTileJoin(segs, grid, ids)
    assert(segCross.exceptAll(naiveSegmentTileJoin(segs, tiles)).isEmpty &&
      naiveSegmentTileJoin(segs, tiles).exceptAll(segCross).isEmpty,
      "probe segment join must equal the predicate join")
    val nElidable = ProblemJoins.elidableLinks(members,
      ProblemJoins.memberTileJoin(members, grid, ids), grid, ids).count()
    assert(nElidable > 0, "the fixture must exercise the elision path")
  }

  test("a link spanning a non-rectangle tile set is not elided") {
    // three tiles in an L: 0 (SW), 1 (S-mid), 3 (NW) — not simple
    val sets = ProblemJoins.simpleNeighbourSets(FixedTiles.rects)
    assert(!sets.contains(Set(0, 1, 3)))
    // and a degenerate single-tile grid only yields its singleton
    val one = ProblemJoins.simpleNeighbourSets(Seq(TileRect(0, 0, 10, 10)))
    assert(one === Set(Set(0)))
  }
}
