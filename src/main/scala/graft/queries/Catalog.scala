package graft.queries

import graft.assign.{LinkMembership, TileAssigner}
import graft.density.DensityJob
import graft.geo.CoordSynthesis
import graft.index.TileIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The operator catalog: every entry is one implemented operator,
 * exposed as a DataFrame query over the test tables plus (where SQL
 * can express it) an equivalent DuckDB oracle query. Column names and
 * types are aligned between both sides — the correctness gate hashes
 * values per column name.
 */
object Catalog {

  type Query = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
  private def orders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
  private def customer(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/customer.parquet")

  /** documents with synthesized map-unit coordinates. */
  private def points(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    docs(s, dir).select(col("doc_id"),
      CoordSynthesis.latCol(id).cast("long").as("lat_mu"),
      CoordSynthesis.lonCol(id).cast("long").as("lon_mu"))
  }

  private val ptsSql =
    s"(SELECT doc_id, ${CoordSynthesis.latSql("doc_id")} AS lat_mu, " +
      s"${CoordSynthesis.lonSql("doc_id")} AS lon_mu FROM documents)"

  // ---- geospatial core ----------------------------------------------------

  private val gb = FixedTiles.bounds
  private val shift = 24 - FixedTiles.Resolution
  private val gw = gb.width >> shift
  private val gh = gb.height >> shift

  private def fixedIndex(overlap: Int) =
    new TileIndex(FixedTiles.rects.toArray, overlap)

  private def assignFixed(s: SparkSession, dir: String, overlap: Int): DataFrame = {
    val p = points(s, dir)
    TileAssigner.explodeByTile(
      TileAssigner.withTileIds(s, p, col("lat_mu"), col("lon_mu"),
        fixedIndex(overlap), nearestFallback = false),
      FixedTiles.StartMapId)
      .select(col("doc_id"), col("map_id").cast("long").as("map_id"))
  }

  private def assignSql(overlap: Int): String =
    "SELECT p.doc_id, CAST(t.map_id AS BIGINT) AS map_id " +
      s"FROM $ptsSql p JOIN " +
      s"(SELECT * FROM ${FixedTiles.valuesSql(overlap)} " +
      "AS v(map_id, min_lat, min_lon, max_lat, max_lon)) t " +
      "ON p.lat_mu BETWEEN t.min_lat AND t.max_lat " +
      "AND p.lon_mu BETWEEN t.min_lon AND t.max_lon"

  val geoQueries: Map[String, Query] = Map(
    "q_coords" -> ((s, dir) => points(s, dir)),

    "q_density" -> ((s, dir) =>
      DensityJob.histogram(points(s, dir), col("lat_mu"), col("lon_mu"),
        gb, FixedTiles.Resolution)
        .select(col("cell_x").cast("long").as("cell_x"),
          col("cell_y").cast("long").as("cell_y"), col("cnt"))),

    "q_bbox" -> ((s, dir) =>
      points(s, dir).agg(
        min(col("lat_mu")).as("min_lat"), min(col("lon_mu")).as("min_lon"),
        max(col("lat_mu")).as("max_lat"), max(col("lon_mu")).as("max_lon"))),

    "q_assign_fixed" -> ((s, dir) => assignFixed(s, dir, 0)),

    "q_assign_overlap" -> ((s, dir) => assignFixed(s, dir, 2000)),

    "q_tile_counts" -> ((s, dir) =>
      assignFixed(s, dir, 0).groupBy("map_id")
        .agg(count(lit(1)).as("doc_count"))),

    // A2+A3: per-tile column marginals -> running sum -> weighted
    // median split position, fully as a dataflow (the distributed
    // analog of the solver's findHorizontalMiddle, and one round of
    // the IterativeSplitter expressed declaratively)
    "q_split_position" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val p = points(s, dir)
      val withTile = p
        .withColumn("map_id",
          (when(col("lon_mu") < lit(gb.minLon + (((gb.width >> shift) / 3) << shift) * 1L), 0)
            .otherwise(1)).cast("long"))
      val marginals = withTile
        .groupBy(col("map_id"),
          DensityJob.cellX(col("lon_mu"), gb, shift).cast("long").as("cx"))
        .agg(count(lit(1)).as("m"))
      val w = Window.partitionBy("map_id").orderBy("cx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tw = Window.partitionBy("map_id")
      marginals
        .withColumn("cum", sum(col("m")).over(w))
        .withColumn("total", sum(col("m")).over(tw))
        .where(col("cum") * 2 >= col("total"))
        .groupBy("map_id")
        .agg(min(col("cx")).as("split_cx"))
    }),

    "q_density_merge" -> ((s, dir) => {
      // A4 raster-raster reconcile: document density as land, event
      // density as the sea/background raster. (r7) keyed variant: the
      // full-outer reconcile joins on the packed cell key both
      // aggregations already partition by (2 fewer exchanges; same
      // cells, same counts — see DensityJob.mergeHistogramsKeyed)
      val land = DensityJob.histogramKeyed(points(s, dir),
        col("lat_mu"), col("lon_mu"), gb, FixedTiles.Resolution)
      val ev = s.read.parquet(s"$dir/events.parquet").select(
        CoordSynthesis.latCol(col("event_id")).cast("long").as("lat_mu"),
        CoordSynthesis.lonCol(col("event_id")).cast("long").as("lon_mu"))
      val sea = DensityJob.histogramKeyed(ev,
        col("lat_mu"), col("lon_mu"), gb, FixedTiles.Resolution)
      DensityJob.mergeHistogramsKeyed(land, sea)
        .select(col("cell_x").cast("long").as("cell_x"),
          col("cell_y").cast("long").as("cell_y"), col("cnt"))
    }),

    "q_h3_density" -> ((s, dir) => {
      // density over the hierarchical cell index via the codegen'd
      // h3lite_encode expression (north-star custom cell encode)
      val p = points(s, dir)
      p.groupBy(graft.functions.H3LiteExpr
          .h3liteEncode(col("lat_mu"), col("lon_mu"), 7).as("cell"))
        .agg(count(lit(1)).as("cnt"))
    }),

    "q_problem_links" -> ((s, dir) => {
      val p = points(s, dir)
      val assignment = TileAssigner.withTileIds(s, p, col("lat_mu"), col("lon_mu"),
        fixedIndex(0), nearestFallback = false)
      val links = p.select(graft.model.LinkModel.linkIdCol().as("link_id")).distinct()
        .select(col("link_id"),
          graft.model.LinkModel.memberIdsCol(col("link_id")).as("member_ids"))
      LinkMembership.linkTiles(links, assignment, salted = true)
        .select(col("link_id"),
          size(col("tile_ids")).cast("long").as("n_tiles"),
          (element_at(col("tile_ids"), 1) + FixedTiles.StartMapId).cast("long").as("min_tile"),
          (element_at(col("tile_ids"), -1) + FixedTiles.StartMapId).cast("long").as("max_tile"),
          col("is_problem"))
    }),

    // P5: problem-link detection restricted by the configurable
    // relation-relevance predicate (boundary-tags exclude list +
    // wanted-admin-level window, reference
    // ProblemListProcessor.java:201-243) over the corpus's
    // deterministic tag model — the predicate pushes into the link
    // scan before any join
    "q_problem_links_tagged" -> ((s, dir) => {
      val p = points(s, dir)
      val assignment = TileAssigner.withTileIds(s, p, col("lat_mu"), col("lon_mu"),
        fixedIndex(0), nearestFallback = false)
      val links = p.select(graft.model.LinkModel.linkIdCol().as("link_id")).distinct()
        .where(graft.assign.RelevanceFilter.relevant(
          graft.assign.RelevanceFilter.relTypeCol(col("link_id")),
          graft.assign.RelevanceFilter.boundaryCol(col("link_id")),
          graft.assign.RelevanceFilter.adminLevelCol(col("link_id"))))
        .select(col("link_id"),
          graft.model.LinkModel.memberIdsCol(col("link_id")).as("member_ids"))
      LinkMembership.linkTiles(links, assignment, salted = true)
        .select(col("link_id"),
          size(col("tile_ids")).cast("long").as("n_tiles"),
          col("is_problem"))
    }))

  val geoOracles: Map[String, String] = Map(
    "q_coords" -> s"SELECT doc_id, lat_mu, lon_mu FROM $ptsSql p",

    "q_density" ->
      (s"SELECT CAST(LEAST((lon_mu - (${gb.minLon})) // ${1 << shift}, ${gw - 1}) AS BIGINT) AS cell_x, " +
        s"CAST(LEAST((lat_mu - (${gb.minLat})) // ${1 << shift}, ${gh - 1}) AS BIGINT) AS cell_y, " +
        s"CAST(count(*) AS BIGINT) AS cnt FROM $ptsSql p " +
        s"WHERE lat_mu BETWEEN ${gb.minLat} AND ${gb.maxLat} " +
        s"AND lon_mu BETWEEN ${gb.minLon} AND ${gb.maxLon} GROUP BY 1, 2"),

    "q_bbox" ->
      (s"SELECT min(lat_mu) AS min_lat, min(lon_mu) AS min_lon, " +
        s"max(lat_mu) AS max_lat, max(lon_mu) AS max_lon FROM $ptsSql p"),

    "q_assign_fixed" -> assignSql(0),

    "q_assign_overlap" -> assignSql(2000),

    "q_tile_counts" ->
      s"SELECT map_id, CAST(count(*) AS BIGINT) AS doc_count FROM (${assignSql(0)}) GROUP BY map_id",

    "q_split_position" -> {
      val edge = gb.minLon + (((gb.width >> shift) / 3) << shift).toLong
      s"WITH pts AS (SELECT *, CASE WHEN lon_mu < $edge THEN 0 ELSE 1 END AS map_id FROM $ptsSql p), " +
        s"marg AS (SELECT map_id, CAST(LEAST((lon_mu - (${gb.minLon})) // ${1 << shift}, ${gw - 1}) AS BIGINT) AS cx, " +
        "CAST(count(*) AS BIGINT) AS m FROM pts GROUP BY 1, 2), " +
        "cums AS (SELECT map_id, cx, sum(m) OVER (PARTITION BY map_id ORDER BY cx " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "sum(m) OVER (PARTITION BY map_id) AS total FROM marg) " +
        "SELECT CAST(map_id AS BIGINT) AS map_id, min(cx) AS split_cx FROM cums " +
        "WHERE cum * 2 >= total GROUP BY 1"
    },

    "q_density_merge" -> {
      def histSql(src: String): String =
        s"SELECT CAST(LEAST((lon_mu - (${gb.minLon})) // ${1 << shift}, ${gw - 1}) AS BIGINT) AS cell_x, " +
          s"CAST(LEAST((lat_mu - (${gb.minLat})) // ${1 << shift}, ${gh - 1}) AS BIGINT) AS cell_y, " +
          s"CAST(count(*) AS BIGINT) AS cnt FROM $src p " +
          s"WHERE lat_mu BETWEEN ${gb.minLat} AND ${gb.maxLat} " +
          s"AND lon_mu BETWEEN ${gb.minLon} AND ${gb.maxLon} GROUP BY 1, 2"
      val evPts = s"(SELECT ${CoordSynthesis.latSql("event_id")} AS lat_mu, " +
        s"${CoordSynthesis.lonSql("event_id")} AS lon_mu FROM events)"
      s"WITH land AS (${histSql(ptsSql)}), sea AS (${histSql(evPts)}) " +
        "SELECT COALESCE(land.cell_x, sea.cell_x) AS cell_x, " +
        "COALESCE(land.cell_y, sea.cell_y) AS cell_y, " +
        "CASE WHEN land.cnt IS NOT NULL THEN land.cnt ELSE sea.cnt * 2 END AS cnt " +
        "FROM land FULL OUTER JOIN sea " +
        "ON land.cell_x = sea.cell_x AND land.cell_y = sea.cell_y"
    },

    "q_h3_density" -> {
      val res = 7
      val latBits = s"((lat_mu + 8388608) // ${1 << (24 - res)})"
      val lonBits = s"((lon_mu + 8388608) // ${1 << (24 - res)})"
      val morton = (0 until res).map(i =>
        s"(($lonBits // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
          s"(($latBits // ${1L << i}) % 2) * ${1L << (2 * i + 1)}").mkString(" + ")
      s"SELECT ${res.toLong << 58} + $morton AS cell, " +
        s"CAST(count(*) AS BIGINT) AS cnt FROM $ptsSql p GROUP BY 1"
    },

    "q_problem_links" ->
      (s"SELECT ${graft.model.LinkModel.linkIdSql()} AS link_id, CAST(count(DISTINCT map_id) AS BIGINT) AS n_tiles, " +
        "min(map_id) AS min_tile, max(map_id) AS max_tile, " +
        "count(DISTINCT map_id) > 1 AS is_problem " +
        s"FROM (${assignSql(0)}) GROUP BY ${graft.model.LinkModel.linkIdSql()}"),

    "q_problem_links_tagged" -> {
      val rf = graft.assign.RelevanceFilter
      s"SELECT link_id, CAST(count(DISTINCT map_id) AS BIGINT) AS n_tiles, " +
        "count(DISTINCT map_id) > 1 AS is_problem " +
        s"FROM (SELECT ${graft.model.LinkModel.linkIdSql()} AS link_id, map_id FROM (${assignSql(0)})) " +
        s"WHERE ${rf.relevantSql(rf.relTypeSql("link_id"),
          rf.boundarySql("link_id"), rf.adminLevelSql("link_id"))} " +
        "GROUP BY link_id"
    })

  // ---- relational operator surface ---------------------------------------

  val relQueries: Map[String, Query] = Map(
    "q1_agg" -> ((s, dir) =>
      lineitem(s, dir).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("count_order"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))),

    "q_join_rev" -> ((s, dir) =>
      orders(s, dir)
        .join(broadcast(customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))),

    "q_window_top1" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),

    "q_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
    }),

    // three-way join: broadcast dims onto the fact table, then
    // aggregate — lets AQE/Catalyst pick and reorder join strategy
    "q_multi_join" -> ((s, dir) =>
      lineitem(s, dir)
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))),

    // tumbling event-time window aggregation (batch shape of the
    // streaming windowed density)
    "q_tumbling" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))),

    // sliding event-time windows (2h length, 1h slide): every event
    // lands in exactly two hour-aligned windows — the batch shape of
    // a sliding streaming aggregation
    "q_sliding" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))),

    // hierarchical ROLLUP aggregation (per-group, per-returnflag,
    // grand total in one pass — Spark's Expand operator)
    "q_rollup" -> ((s, dir) =>
      lineitem(s, dir).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"))),

    // gap sessionization over the event stream: lag window -> session
    // id by cumulative gap flags -> per-session aggregates
    "q_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = s.read.parquet(s"$dir/events.parquet")
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = ev.select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev_ts").cast("timestamp"))) > 3600000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"))
    }),

    "q_semi" -> ((s, dir) =>
      customer(s, dir)
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders"))),

    "q_anti" -> ((s, dir) =>
      customer(s, dir)
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without_orders"))))

  val relOracles: Map[String, String] = Map(
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, " +
        "CAST(count(*) AS BIGINT) AS count_order, " +
        "round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),

    "q_join_rev" ->
      ("SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders, " +
        "round(sum(o_totalprice), 2) AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey"),

    "q_window_top1" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn = 1"),

    "q_running_sum" ->
      ("SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (" +
        "PARTITION BY o_custkey ORDER BY o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total " +
        "FROM orders"),

    "q_multi_join" ->
      ("SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(sum(l_quantity) AS BIGINT) AS sum_qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment, o_orderpriority"),

    "q_tumbling" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, " +
        "CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total " +
        "FROM events GROUP BY 1, 2"),

    "q_sliding" ->
      ("SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n FROM (" +
        "SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS w_start, " +
        "event_type FROM events, (VALUES (0), (1)) off(k)) GROUP BY 1, 2"),

    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, " +
        "CAST(count(*) AS BIGINT) AS n FROM lineitem " +
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),

    "q_sessions" ->
      ("WITH flagged AS (SELECT user_id, session_id, event_id FROM (" +
        "SELECT user_id, event_id, " +
        "sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM (" +
        "SELECT user_id, ts, event_id, " +
        "CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 3600000000 " +
        "THEN 1 ELSE 0 END AS new_sess FROM events))) " +
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, " +
        "CAST(count(*) AS BIGINT) AS n_events, min(event_id) AS first_event " +
        "FROM flagged GROUP BY user_id, session_id"),

    "q_semi" ->
      ("SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_with_orders FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "GROUP BY c_nationkey"),

    "q_anti" ->
      ("SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_without_orders FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) " +
        "GROUP BY c_nationkey"))

  // ---- text / training-data ops -------------------------------------------

  private val stopwords = Seq("the", "and", "of", "a", "in", "to")
  private val stopwordsSqlList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  val textQueries: Map[String, Query] = Map(
    // hash-first: shuffle a 32-byte digest per doc, never the full
    // document text (texts are KB-to-MB at production scale)
    "q_dedup_exact" -> ((s, dir) =>
      docs(s, dir).groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .select(col("keeper_id"), col("n_copies"))),

    "q_token_count" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))),

    // BPE-style pre-tokenization: letter runs and digit runs count as
    // separate tokens (regex identical in both engines' dialects)
    "q_token_bpe" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+', 0)"))
          .cast("long").as("n_tokens"))),

    "q_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(filter(split(col("text"), " "),
          t => t.isInCollection(stopwords))).cast("long").as("n_stop"))
        .withColumn("stop_ppm",
          expr("n_stop * 1000000 div n_tokens"))))

  val textOracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      ("SELECT CAST(min(doc_id) AS BIGINT) AS keeper_id, CAST(count(*) AS BIGINT) AS n_copies " +
        "FROM documents GROUP BY md5(text)"),

    "q_token_count" ->
      "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents",

    "q_token_bpe" ->
      ("SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS BIGINT) " +
        "AS n_tokens FROM documents"),

    "q_quality" ->
      ("SELECT doc_id, n_tokens, n_stop, n_stop * 1000000 // n_tokens AS stop_ppm FROM (" +
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, " +
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN $stopwordsSqlList)) AS BIGINT) AS n_stop " +
        "FROM documents)"))

  def all: Map[String, Query] =
    geoQueries ++ relQueries ++ textQueries ++ OpsCatalog.queries ++
      LinkCatalog.queries
  def oracles: Map[String, String] =
    geoOracles ++ relOracles ++ textOracles ++ OpsCatalog.oracles ++
      LinkCatalog.oracles
}
