package graft.queries

import graft.assign.ProblemJoins
import graft.geo.CoordSynthesis
import graft.model.LinkModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Border-crossing link machinery (SURVEY §2.5 J4/J5/J8) as catalog
 * queries. Links are derived arithmetically from document ids (link L
 * owns docs 5L..5L+4, superlink S owns links 3S..3S+2), so the DuckDB
 * oracle reconstructs the same structures with plain SQL.
 */
object LinkCatalog {
  import Catalog.Query

  private val ptsSql =
    s"(SELECT doc_id, ${CoordSynthesis.latSql("doc_id")} AS lat_mu, " +
      s"${CoordSynthesis.lonSql("doc_id")} AS lon_mu FROM documents)"

  private def points(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"),
      CoordSynthesis.latCol(id).cast("long").as("lat_mu"),
      CoordSynthesis.lonCol(id).cast("long").as("lon_mu"))
  }

  private def members(s: SparkSession, dir: String): DataFrame =
    points(s, dir).withColumn("link_id", LinkModel.linkIdCol())

  private val fixedMapIds: Seq[Long] =
    FixedTiles.rects.indices.map(i => (FixedTiles.StartMapId + i).toLong)

  /** Fixed tiles as a dimension DataFrame (t_-prefixed bounds). */
  private def tilesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    FixedTiles.rects.zipWithIndex.map { case (r, i) =>
      (FixedTiles.StartMapId + i.toLong, r.minLat.toLong, r.minLon.toLong,
        r.maxLat.toLong, r.maxLon.toLong)
    }.toDF("map_id", "t_min_lat", "t_min_lon", "t_max_lat", "t_max_lon")
  }

  private val tilesSql =
    s"(SELECT * FROM ${FixedTiles.valuesSql(0)} " +
      "AS v(map_id, t_min_lat, t_min_lon, t_max_lat, t_max_lon))"

  /** Consecutive member pairs of each link, order-preserving:
    * (link_id, x1, y1, x2, y2) with x = lon, y = lat. */
  private def segments(s: SparkSession, dir: String): DataFrame = {
    val p1 = points(s, dir).select(col("doc_id").as("id1"),
      col("lon_mu").as("x1"), col("lat_mu").as("y1"))
    val p2 = points(s, dir).select(col("doc_id").as("id2"),
      col("lon_mu").as("x2"), col("lat_mu").as("y2"))
    p1.where(LinkModel.segmentStartCol("id1"))
      .join(p2, col("id2") === col("id1") + 1)
      .select(LinkModel.linkIdCol("id1").as("link_id"),
        col("x1"), col("y1"), col("x2"), col("y2"))
  }

  private val segmentsSql =
    s"(SELECT ${LinkModel.linkIdSql("p1.doc_id")} AS link_id, p1.lon_mu AS x1, p1.lat_mu AS y1, " +
      s"p2.lon_mu AS x2, p2.lat_mu AS y2 FROM $ptsSql p1 JOIN $ptsSql p2 " +
      s"ON p2.doc_id = p1.doc_id + 1 AND ${LinkModel.segmentStartSql("p1.doc_id")})"

  /** Two-level membership edges: superlink -> link -> doc. */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    val linkDoc = docs.select(
      (LinkModel.linkIdCol() + LinkModel.LinkParentOffset).as("parent_id"),
      col("doc_id").as("child_id"))
    val superLink = docs.select(LinkModel.linkIdCol().as("l")).distinct()
      .select((LinkModel.superIdCol("l") + LinkModel.SuperParentOffset).as("parent_id"),
        (col("l") + LinkModel.LinkParentOffset).as("child_id"))
    linkDoc.unionByName(superLink)
  }

  private val edgesSql =
    s"(SELECT ${LinkModel.linkIdSql()} + ${LinkModel.LinkParentOffset} AS parent_id, " +
      "doc_id AS child_id FROM documents " +
      "UNION ALL " +
      s"SELECT DISTINCT (${LinkModel.linkIdSql()}) // ${LinkModel.LinksPerSuper} + " +
      s"${LinkModel.SuperParentOffset}, " +
      s"${LinkModel.linkIdSql()} + ${LinkModel.LinkParentOffset} FROM documents)"

  val queries: Map[String, Query] = Map(
    "q_link_bbox" -> ((s, dir) => ProblemJoins.linkBboxes(members(s, dir))),

    "q_bbox_tile_join" -> ((s, dir) =>
      ProblemJoins.bboxTileJoin(
        ProblemJoins.linkBboxes(members(s, dir)), FixedTiles.rects,
        fixedMapIds)),

    "q_segment_cross" -> ((s, dir) =>
      ProblemJoins.segmentTileJoin(segments(s, dir), FixedTiles.rects,
        fixedMapIds)),

    "q_closure" -> ((s, dir) =>
      ProblemJoins.membershipClosure(edges(s, dir))),

    // keep-complete composition: a link's output tiles are the union
    // of its members' point tiles (J2) and the tiles its segments
    // cross (J5) — the reference's keep-complete duplication
    // (`MultiTileProcessor.addWritersOfWay:684-731`), with the O6
    // simple-neighbour elision: the segment theta-join runs only for
    // links whose member tiles do NOT form a rectangle
    "q_keep_complete" -> ((s, dir) =>
      ProblemJoins.keepCompleteTiles(
        members(s, dir), segments(s, dir), FixedTiles.rects, fixedMapIds)),

    // O6 elision decision itself, oracle-gated: links whose member
    // points all landed in tiles AND whose tile set is a
    // rectangle-forming simple-neighbour combination — exactly the
    // links keepCompleteTiles anti-joins out of the segment theta-join
    // (reference AreaDictionary.findSimpleNeigbours:100-136 consumed
    // via mayCross, MultiTileProcessor.java:702-710)
    "q_elidable" -> ((s, dir) =>
      ProblemJoins.elidableLinks(
        members(s, dir),
        ProblemJoins.memberTileJoin(members(s, dir), FixedTiles.rects,
          fixedMapIds),
        FixedTiles.rects,
        fixedMapIds)),

    // J6: tile naming — top-population city inside each tile bbox
    // (reference `AreaList.setAreaNames:272-298`): spatial containment
    // join against a broadcast dimension + top-1 window
    "q_tile_names" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val cities = cust.select(
        col("c_custkey").cast("long").as("city_id"),
        col("c_name").as("city_name"),
        round(col("c_acctbal") * 100).cast("long").as("population"),
        CoordSynthesis.latCol(col("c_custkey") + 777).cast("long").as("lat_mu"),
        CoordSynthesis.lonCol(col("c_custkey") + 777).cast("long").as("lon_mu"))
      val joined = tilesDf(s).join(broadcast(cities),
        col("lat_mu") >= col("t_min_lat") && col("lat_mu") <= col("t_max_lat") &&
          col("lon_mu") >= col("t_min_lon") && col("lon_mu") <= col("t_max_lon"))
      val w = Window.partitionBy(col("map_id"))
        .orderBy(col("population").desc, col("city_id"))
      joined.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("map_id"), col("city_name"), col("population"))
    }))

  val oracles: Map[String, String] = Map(
    "q_link_bbox" ->
      (s"SELECT ${LinkModel.linkIdSql()} AS link_id, min(lat_mu) AS min_lat, min(lon_mu) AS min_lon, " +
        s"max(lat_mu) AS max_lat, max(lon_mu) AS max_lon FROM $ptsSql p GROUP BY 1"),

    "q_bbox_tile_join" ->
      (s"WITH bb AS (SELECT ${LinkModel.linkIdSql()} AS link_id, min(lat_mu) AS min_lat, " +
        "min(lon_mu) AS min_lon, max(lat_mu) AS max_lat, max(lon_mu) AS max_lon " +
        s"FROM $ptsSql p GROUP BY 1) " +
        s"SELECT link_id, CAST(map_id AS BIGINT) AS map_id FROM bb JOIN $tilesSql t ON " +
        "bb.min_lat <= t.t_max_lat AND bb.max_lat >= t.t_min_lat AND " +
        "bb.min_lon <= t.t_max_lon AND bb.max_lon >= t.t_min_lon"),

    // NOTE: LEAST/GREATEST over two COLUMNS inside a join predicate
    // hits a DuckDB internal error ("requires a flat vector") at
    // larger row counts and poisons the connection for all later
    // queries; the predicate is therefore expressed in pure OR form
    // (LEAST(a,b) <= c  ===  a <= c OR b <= c), which is also what
    // the Spark side's least/greatest compiles down to semantically.
    "q_segment_cross" ->
      ("WITH segt AS (SELECT s.link_id, t.map_id, " +
        "(s.x2 - s.x1) * (t.t_min_lat - s.y1) - (s.y2 - s.y1) * (t.t_min_lon - s.x1) AS c1, " +
        "(s.x2 - s.x1) * (t.t_max_lat - s.y1) - (s.y2 - s.y1) * (t.t_min_lon - s.x1) AS c2, " +
        "(s.x2 - s.x1) * (t.t_min_lat - s.y1) - (s.y2 - s.y1) * (t.t_max_lon - s.x1) AS c3, " +
        "(s.x2 - s.x1) * (t.t_max_lat - s.y1) - (s.y2 - s.y1) * (t.t_max_lon - s.x1) AS c4 " +
        s"FROM $segmentsSql s JOIN $tilesSql t ON " +
        "(s.x1 <= t.t_max_lon OR s.x2 <= t.t_max_lon) AND (s.x1 >= t.t_min_lon OR s.x2 >= t.t_min_lon) AND " +
        "(s.y1 <= t.t_max_lat OR s.y2 <= t.t_max_lat) AND (s.y1 >= t.t_min_lat OR s.y2 >= t.t_min_lat)) " +
        "SELECT DISTINCT link_id, CAST(map_id AS BIGINT) AS map_id FROM segt " +
        "WHERE (c1 <= 0 OR c2 <= 0 OR c3 <= 0 OR c4 <= 0) " +
        "AND (c1 >= 0 OR c2 >= 0 OR c3 >= 0 OR c4 >= 0)"),

    "q_closure" ->
      (s"WITH e AS $edgesSql " +
        "SELECT parent_id AS root_id, child_id AS leaf_id FROM e " +
        "UNION " +
        "SELECT a.parent_id, b.child_id FROM e a JOIN e b ON a.child_id = b.parent_id"),

    "q_keep_complete" -> {
      val memberSql =
        s"SELECT ${LinkModel.linkIdSql("p.doc_id")} AS link_id, CAST(t.map_id AS BIGINT) AS map_id " +
          s"FROM $ptsSql p JOIN $tilesSql t ON " +
          "p.lat_mu BETWEEN t.t_min_lat AND t.t_max_lat AND " +
          "p.lon_mu BETWEEN t.t_min_lon AND t.t_max_lon"
      val crossSql =
        "SELECT link_id, CAST(map_id AS BIGINT) AS map_id FROM (" +
          "SELECT s.link_id, t.map_id, " +
          "(s.x2 - s.x1) * (t.t_min_lat - s.y1) - (s.y2 - s.y1) * (t.t_min_lon - s.x1) AS c1, " +
          "(s.x2 - s.x1) * (t.t_max_lat - s.y1) - (s.y2 - s.y1) * (t.t_min_lon - s.x1) AS c2, " +
          "(s.x2 - s.x1) * (t.t_min_lat - s.y1) - (s.y2 - s.y1) * (t.t_max_lon - s.x1) AS c3, " +
          "(s.x2 - s.x1) * (t.t_max_lat - s.y1) - (s.y2 - s.y1) * (t.t_max_lon - s.x1) AS c4 " +
          s"FROM $segmentsSql s JOIN $tilesSql t ON " +
          "(s.x1 <= t.t_max_lon OR s.x2 <= t.t_max_lon) AND (s.x1 >= t.t_min_lon OR s.x2 >= t.t_min_lon) AND " +
          "(s.y1 <= t.t_max_lat OR s.y2 <= t.t_max_lat) AND (s.y1 >= t.t_min_lat OR s.y2 >= t.t_min_lat)) " +
          "WHERE (c1 <= 0 OR c2 <= 0 OR c3 <= 0 OR c4 <= 0) " +
          "AND (c1 >= 0 OR c2 >= 0 OR c3 >= 0 OR c4 >= 0)"
      s"SELECT DISTINCT link_id, map_id FROM (($memberSql) UNION ALL ($crossSql))"
    },

    "q_elidable" -> {
      // the simple-neighbour combinations are a driver-side constant
      // of the fixed tiling; the oracle receives them as literal
      // sorted map-id strings
      val mapIds = FixedTiles.rects.indices
        .map(i => (FixedTiles.StartMapId + i).toLong)
      val sets = ProblemJoins.simpleNeighbourSets(FixedTiles.rects).toSeq
        .map(s => s.map(mapIds).toSeq.sorted.mkString("-"))
        .sorted.map(v => s"'$v'").mkString("(", ", ", ")")
      s"WITH m AS (SELECT ${LinkModel.linkIdSql("p.doc_id")} AS link_id, p.doc_id, t.map_id " +
        s"FROM $ptsSql p JOIN $tilesSql t ON " +
        "p.lat_mu BETWEEN t.t_min_lat AND t.t_max_lat AND " +
        "p.lon_mu BETWEEN t.t_min_lon AND t.t_max_lon), " +
        "per AS (SELECT link_id, count(DISTINCT doc_id) AS n_matched, " +
        "array_to_string(list_sort(list(DISTINCT map_id)), '-') AS tset " +
        "FROM m GROUP BY link_id), " +
        s"tot AS (SELECT ${LinkModel.linkIdSql()} AS link_id, " +
        s"count(DISTINCT doc_id) AS n_members FROM $ptsSql p GROUP BY 1) " +
        "SELECT per.link_id FROM per JOIN tot ON per.link_id = tot.link_id " +
        s"WHERE n_matched = n_members AND tset IN $sets"
    },

    "q_tile_names" ->
      ("WITH cities AS (SELECT c_custkey AS city_id, c_name AS city_name, " +
        "CAST(round(c_acctbal * 100) AS BIGINT) AS population, " +
        s"${CoordSynthesis.latSql("c_custkey + 777")} AS lat_mu, " +
        s"${CoordSynthesis.lonSql("c_custkey + 777")} AS lon_mu FROM customer) " +
        "SELECT CAST(map_id AS BIGINT) AS map_id, city_name, population FROM (" +
        s"SELECT t.map_id, c.city_name, c.population, row_number() OVER (" +
        "PARTITION BY t.map_id ORDER BY c.population DESC, c.city_id) AS rn " +
        s"FROM $tilesSql t JOIN cities c ON " +
        "c.lat_mu BETWEEN t.t_min_lat AND t.t_max_lat AND " +
        "c.lon_mu BETWEEN t.t_min_lon AND t.t_max_lon) WHERE rn = 1"))
}
