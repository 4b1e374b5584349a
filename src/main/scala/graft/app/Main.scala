package graft.app

import graft.assign.{LinkMembership, ProblemJoins, RelevanceFilter, TileAssigner}
import graft.output.AreaWriters
import graft.pipeline.{SplitConfig, SplitPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Command-line surface with the reference's option names, defaults
 * and validation (`args/SplitterParams.java:21-126`,
 * `Main.java:264-270,420-460`): `--name=value` pairs plus bare input
 * paths. Options that configure the engine are honored; options that
 * only made sense for the single-node OSM-file engine (cache,
 * max-threads, status-freq, mixed) are accepted and ignored, exactly
 * like the reference treats its own deprecated flags.
 */
final case class SplitterArgs(
    mapid: Int = 63240001,
    description: Option[String] = None,
    maxNodes: Long = 1600000L,
    maxAreas: Int = 2048,
    numTiles: Option[Int] = None,
    resolution: Int = 13,
    overlap: String = "auto",
    keepComplete: Boolean = true,
    outputDir: String = ".",
    splitFile: Option[String] = None,
    geonamesFile: Option[String] = None,
    writeKml: Option[String] = None,
    noTrim: Boolean = false,
    searchLimit: Int = 200000,
    stopAfter: String = "dist",
    problemFile: Option[String] = None,
    problemReport: Option[String] = None,
    polygonFile: Option[String] = None,
    polygonDescFile: Option[String] = None,
    precompSea: Option[String] = None,
    boundaryTags: Option[String] = None,
    wantedAdminLevel: Option[Int] = None,
    output: String = "parquet",
    handleElementVersion: String = "remove",
    inputs: Seq[String] = Nil) {

  /** Overlap amount after the reference's auto/keep-complete default
    * handling (`Main.java:432-449`). */
  def overlapAmount: Int = overlap match {
    case "auto" => if (keepComplete) 0 else 2000
    case v => v.toInt
  }

  def toConfig: SplitConfig = SplitConfig(
    resolution = resolution,
    maxNodes = maxNodes,
    overlap = overlapAmount,
    keepComplete = keepComplete,
    startMapId = mapid,
    trim = !noTrim,
    searchLimit = searchLimit,
    numTiles = numTiles)
}

object SplitterArgs {
  val ValidStopAfter: Seq[String] =
    Seq("split", "gen-problem-list", "handle-problem-list", "dist")

  /** Every option name the reference's SplitterParams interface
    * derives (kebab-case of the getter). */
  val KnownOptions: Set[String] = Set(
    "mapid", "description", "max-areas", "overlap", "max-nodes",
    "num-tiles", "resolution", "mixed", "cache", "output-dir",
    "split-file", "geonames-file", "write-kml", "status-freq",
    "no-trim", "max-threads", "output", "problem-file",
    "keep-complete", "problem-report", "polygon-file",
    "polygon-desc-file", "stop-after", "precomp-sea", "boundary-tags",
    "wanted-admin-level", "search-limit", "handle-element-version",
    "ignore-osm-bounds")

  /** Parse `--name=value` / `--flag` / bare input paths. Returns
    * Left(message) on the same error classes the reference rejects. */
  def parse(args: Seq[String]): Either[String, SplitterArgs] = {
    var a = SplitterArgs()
    val inputs = Seq.newBuilder[String]
    try {
      args.foreach { raw =>
        if (!raw.startsWith("--")) inputs += raw
        else {
          val (name, value) = raw.drop(2).split("=", 2) match {
            case Array(n, v) => (n, v)
            case Array(n) => (n, "true") // bare boolean flag
          }
          if (!KnownOptions.contains(name))
            return Left(s"Unknown option '--$name'. Valid options are: " +
              KnownOptions.toSeq.sorted.mkString(", "))
          name match {
            case "mapid" => a = a.copy(mapid = value.toInt)
            case "max-areas" => a = a.copy(maxAreas = value.toInt)
            case "description" => a = a.copy(description = Some(value))
            case "max-nodes" => a = a.copy(maxNodes = value.toLong)
            case "num-tiles" => a = a.copy(numTiles = Some(value.toInt))
            case "resolution" => a = a.copy(resolution = value.toInt)
            case "overlap" => a = a.copy(overlap = value)
            case "keep-complete" => a = a.copy(keepComplete = value.toBoolean)
            case "output-dir" => a = a.copy(outputDir = value)
            case "split-file" => a = a.copy(splitFile = Some(value))
            case "geonames-file" => a = a.copy(geonamesFile = Some(value))
            case "write-kml" => a = a.copy(writeKml = Some(value))
            case "no-trim" => a = a.copy(noTrim = value.toBoolean)
            case "search-limit" => a = a.copy(searchLimit = value.toInt)
            case "stop-after" => a = a.copy(stopAfter = value)
            case "problem-file" => a = a.copy(problemFile = Some(value))
            case "problem-report" => a = a.copy(problemReport = Some(value))
            case "polygon-file" => a = a.copy(polygonFile = Some(value))
            case "polygon-desc-file" =>
              a = a.copy(polygonDescFile = Some(value))
            case "precomp-sea" => a = a.copy(precompSea = Some(value))
            case "boundary-tags" => a = a.copy(boundaryTags = Some(value))
            case "wanted-admin-level" =>
              a = a.copy(wantedAdminLevel = Some(value.toInt))
            case "output" => a = a.copy(output = value)
            case "handle-element-version" =>
              a = a.copy(handleElementVersion = value)
            case _ => () // accepted-and-ignored legacy option
          }
        }
      }
    } catch {
      case e: NumberFormatException => return Left(s"Invalid numeric value: ${e.getMessage}")
      case e: IllegalArgumentException => return Left(s"Invalid value: ${e.getMessage}")
    }
    a = a.copy(inputs = inputs.result())
    // the reference's plausibility checks (Main.java:408-449)
    if (!ValidStopAfter.contains(a.stopAfter))
      return Left("the --stop-after parameter must be one of " +
        ValidStopAfter.mkString("[", ", ", "]") + ".")
    if (a.searchLimit < 1000)
      return Left("The --search-limit parameter must be 1000 or higher.")
    if (a.resolution < 1 || a.resolution > 24)
      return Left("The --resolution parameter must be between 1 and 24.")
    if (a.overlap != "auto") scala.util.Try(a.overlap.toInt).toOption match {
      case None =>
        return Left("The --overlap parameter must be a number or auto.")
      case Some(v) if v < 0 =>
        return Left("The --overlap parameter must not be negative.")
      case _ => ()
    }
    if (!Seq("remove", "fake", "keep").contains(a.handleElementVersion))
      return Left("The --handle-element-version parameter must be remove, fake, or keep.")
    if (a.maxNodes < 1)
      return Left("The --max-nodes parameter must be positive.")
    if (a.maxAreas < 1 || a.maxAreas > 9999)
      return Left("The --max-areas parameter must be a value between 1 and 9999.")
    Right(a)
  }
}

/**
 * Phase driver mirroring the reference `Main` (split ->
 * gen-problem-list -> handle-problem-list -> dist), each phase gated
 * by `--stop-after` and checkpointed to `output-dir` so a rerun
 * resumes from artifacts (split-file reuse semantics).
 */
object Main {

  /** Links derive arithmetically from doc ids — the corpus's link
    * model ([[graft.model.LinkModel]]), shared with the catalog. */
  private def linksOf(points: DataFrame): DataFrame =
    points.select(graft.model.LinkModel.linkIdCol().as("link_id")).distinct()
      .select(col("link_id"),
        graft.model.LinkModel.memberIdsCol(col("link_id")).as("member_ids"))

  /** Solved areas as a t_-prefixed broadcast dimension. */
  private def tilesDimOf(spark: SparkSession,
                         areas: Seq[graft.output.AreaDef]): DataFrame =
    spark.createDataFrame(areas.map(ad =>
      (ad.mapId.toLong, ad.rect.minLat.toLong, ad.rect.minLon.toLong,
        ad.rect.maxLat.toLong, ad.rect.maxLon.toLong)))
      .toDF("map_id", "t_min_lat", "t_min_lon", "t_max_lat", "t_max_lon")

  /** Run all phases up to `stopAfter`; returns the last phase run.
    * Inputs that are OSM files (`.osm[.gz]` / `.o5m` / `.pbf`) run the
    * OSM-entity pipeline ([[OsmSplit]]); parquet paths run the corpus
    * pipeline below. */
  def run(spark: SparkSession, a: SplitterArgs): String = {
    require(a.inputs.nonEmpty, "at least one input path is required")
    if (a.inputs.forall(OsmSplit.isOsmInput)) return OsmSplit.run(spark, a)
    val cfg = a.toConfig
    val outDir = a.outputDir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // metrics reflect THIS run's artifacts: truncate, never accumulate
    // stale phase lines from earlier runs into the same output dir
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$outDir/metrics.jsonl"))
    val raw = a.inputs.map(spark.read.parquet(_)).reduce(_ unionByName _)
    // normalize: the interleaved corpus carries string doc ids
    // ("d%012d"); flat test tables carry numeric ones
    val docs =
      if (raw.schema("doc_id").dataType == org.apache.spark.sql.types.StringType)
        raw.withColumn("doc_id",
          graft.model.InterleavedCorpus.idOfDocId(col("doc_id")))
      else raw
    val points = docs
      .withColumn("lat_mu", graft.geo.CoordSynthesis.latCol(col("doc_id")))
      .withColumn("lon_mu", graft.geo.CoordSynthesis.lonCol(col("doc_id")))

    // ---- phase: split (density -> solve -> areas.* artifacts) ------
    val solved = solveAreas(spark, a, cfg, points)
    val areas = finalizeAreas(spark, a, solved, outDir)
    if (a.stopAfter == "split") return "split"
    runLinkedPhases(spark, a, cfg, outDir, points, areas)
  }

  /** The split phase's solve: split-file reuse, else density grid
    * (optionally sea-merged) -> BSP / polygon-constrained solve. */
  private[app] def solveAreas(spark: SparkSession, a: SplitterArgs,
      cfg: SplitConfig, points: DataFrame): Seq[graft.output.AreaDef] =
    a.splitFile match {
      case Some(f) => AreaWriters.readAreasList(f) // split-file reuse
      case None =>
        // bounds computed once so sea read + both histograms align
        val bounds = cfg.bounds.getOrElse(graft.density.DensityJob.bbox(
          points, col("lat_mu"), col("lon_mu")))
        val cfgB = cfg.copy(bounds = Some(bounds))
        // --precomp-sea: coastline points of the covering mixed tiles
        // merged as the sea background (empty land cells take sea*2,
        // reference Main.java:252-257 -> DensityMap.mergeSeaData)
        val grid = a.precompSea match {
          case Some(seaDir) =>
            val sea = graft.sources.PrecompSea.readSeaPoints(spark, seaDir, bounds)
            SplitPipeline.computeGridWithSea(points, sea, cfgB)
          case None => SplitPipeline.computeGrid(points, cfgB)
        }
        // --polygon-desc-file (named polygons, takes precedence like
        // the reference's readPolygonDescFile after readPolygonFile,
        // AreasCalculator.java:52-53) or --polygon-file constrain the
        // solve. The desc analog is a DIRECTORY of osmosis .poly
        // files (the reference reads one OSM XML of named polygons;
        // OSM parsing is out of scope by design, the .poly name line
        // carries the region name).
        val as = (a.polygonDescFile, a.polygonFile) match {
          case (Some(dir), _) =>
            val files = Option(new java.io.File(dir)
                .listFiles((_, n) => n.endsWith(".poly")))
              .getOrElse(throw new IllegalArgumentException(
                s"polygon desc directory doesn't exist: $dir"))
              .sortBy(_.getName)
            val polys = files.toSeq.map { f =>
              graft.solver.NamedPolygon(
                graft.output.PolyWriters.readPolyName(f.getPath),
                graft.solver.PolygonSupport.polygonOf(
                  graft.output.PolyWriters.readPoly(f.getPath)))
            }
            graft.solver.NamedPolygonSplit
              .split(grid, polys, cfg.maxNodes, cfg.searchLimit)
              .flatMap { case (desc, tiles) => tiles.map(r => (desc, r)) }
              .zipWithIndex
              .map { case ((desc, r), i) =>
                graft.output.AreaDef(cfg.startMapId + i, r, Some(desc)) }
          case (None, Some(pf)) =>
            val poly = graft.solver.PolygonSupport.polygonOf(
              graft.output.PolyWriters.readPoly(pf))
            graft.solver.PolygonSupport
              .split(grid, poly, cfg.maxNodes, cfg.searchLimit)
              .zipWithIndex
              .map { case (r, i) => graft.output.AreaDef(cfg.startMapId + i, r) }
          case _ => SplitPipeline.solve(grid, cfg)
        }
        if (a.mapid + as.size > 99999999)
          throw new IllegalArgumentException(
            s"Too many areas for initial mapid ${a.mapid}")
        as
    }

  /** J6 naming (top-population geonames city per tile, else the
    * --description default — reference AreaList.setAreaNames:272-298)
    * plus the areas.list / template.args / areas.poly / kml artifacts. */
  private[app] def finalizeAreas(spark: SparkSession, a: SplitterArgs,
      solved: Seq[graft.output.AreaDef], outDir: String): Seq[graft.output.AreaDef] = {
    val areas = a.geonamesFile match {
      case Some(gf) =>
        val cities = graft.sources.GeoNames.loadCities(spark, gf)
        val names = graft.sources.GeoNames
          .nameTiles(tilesDimOf(spark, solved), cities)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        solved.map(ad => ad.copy(name =
          names.get(ad.mapId.toLong).orElse(ad.name).orElse(a.description)))
      case None => solved.map(ad => ad.copy(name = ad.name.orElse(a.description)))
    }
    AreaWriters.writeAreasList(s"$outDir/areas.list", areas)
    AreaWriters.writeTemplateArgs(s"$outDir/template.args", areas, a.output)
    graft.output.PolyWriters.writePoly(s"$outDir/areas.poly", "area", // reference AreaList.java:196 hardcodes "area"
      areas.map(_.rect))
    a.writeKml.foreach { kml =>
      val path = if (new java.io.File(kml).isAbsolute) kml else s"$outDir/$kml"
      graft.output.PolyWriters.writeKml(path, areas)
    }
    areas
  }

  /** The corpus pipeline's post-split phases (gen-problem-list ->
    * handle-problem-list -> dist). */
  private def runLinkedPhases(spark: SparkSession, a: SplitterArgs,
      cfg: graft.pipeline.SplitConfig, outDir: String, points: DataFrame,
      areas: Seq[graft.output.AreaDef]): String = {
    // ---- phase: gen-problem-list (border-crossing links) -----------
    // --problem-file replaces the computation entirely (reference
    // Main.java:198-213 -> ProblemLists.readProblemIds:129-179);
    // otherwise links are tag-filtered by the P5 relevance predicate
    // when --boundary-tags / --wanted-admin-level are given
    // (ProblemListProcessor.java:201-243) and border-crossers are
    // detected via the salted membership aggregation.
    // --problem-report names the problem-list artifact; the reference
    // ignores it under --keep-complete=false (Main.java:451-453),
    // with the same warning wording
    val reportPath =
      if (!a.keepComplete) {
        if (a.problemReport.isDefined)
          System.err.println("Parameter --problem-report is ignored, " +
            "because parameter --keep-complete=false is used")
        s"$outDir/problem.list"
      } else a.problemReport.getOrElse(s"$outDir/problem.list")
    val index = SplitPipeline.buildIndex(areas, cfg)
    val assignment = TileAssigner.withTileIds(spark, points,
      col("lat_mu"), col("lon_mu"), index, cfg.nearestFallback)
    // problem links stay a Dataset end-to-end: the computed path
    // never collects link ids to the driver — problem.list streams
    // out one partition at a time and the handle phase semi-joins
    // against the same checkpointed frame. Only --problem-file input
    // is inherently a (bounded) driver artifact.
    var fileIdCount = 0L
    val problems: DataFrame = (a.problemFile match {
      case Some(pf) =>
        import spark.implicits._
        val (ways, rels) = AreaWriters.readProblemList(pf)
        val allIds = ways ++ rels
        fileIdCount = allIds.size.toLong
        // non-numeric ids can name links no corpus doc carries; they
        // round-trip through problem.list but join nothing
        AreaWriters.writeProblemList(reportPath, allIds, Nil)
        allIds.flatMap(p => scala.util.Try(p.toLong).toOption)
          .toDF("link_id")
      case None =>
        val allLinks = linksOf(points)
        val considered =
          if (a.boundaryTags.isEmpty && a.wantedAdminLevel.isEmpty) allLinks
          else allLinks.where(RelevanceFilter.relevant(
            RelevanceFilter.relTypeCol(col("link_id")),
            RelevanceFilter.boundaryCol(col("link_id")),
            RelevanceFilter.adminLevelCol(col("link_id")),
            a.boundaryTags.getOrElse(RelevanceFilter.UseExcludeList),
            a.wantedAdminLevel.getOrElse(RelevanceFilter.DefaultWantedAdminLevel)))
        val linkTiles = LinkMembership.linkTiles(considered, assignment,
          salted = true)
        LinkMembership.problemLinks(linkTiles)
    }).localCheckpoint(true)
    val nProblems = a.problemFile match {
      // metric counts what the problem.list artifact holds — ALL file
      // ids, including non-numeric ones that join nothing
      case Some(_) => fileIdCount
      case None =>
        // stream the sorted list to disk: bounded driver memory at any
        // problem count (same byte format writeProblemList produces,
        // string-sorted like its Seq[String] path)
        AreaWriters.writeProblemListStreamed(reportPath, problems)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/metrics.jsonl"),
      s"""{"phase":"gen-problem-list","problems":$nProblems}""" + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    if (a.stopAfter == "gen-problem-list") return "gen-problem-list"

    // ---- phase: handle-problem-list (keep-complete duplication) ----
    // only the problem links are handled — file-given or computed —
    // matching the reference's handle-problem-list scope
    // (MultiTileProcessor consumes exactly the problem list). The
    // semi-joins are plain equi-joins on the checkpointed problem
    // frame: Spark broadcasts it while it is small and falls back to
    // a shuffled semi-join at planet-scale problem counts.
    if (cfg.keepComplete) {
      val members = points
        .withColumn("link_id", graft.model.LinkModel.linkIdCol())
        .join(problems, Seq("link_id"), "left_semi")
      val p1 = points.select(col("doc_id").as("id1"),
        col("lon_mu").as("x1"), col("lat_mu").as("y1"))
      val p2 = points.select(col("doc_id").as("id2"),
        col("lon_mu").as("x2"), col("lat_mu").as("y2"))
      val segments = p1.where(graft.model.LinkModel.segmentStartCol("id1"))
        .join(p2, col("id2") === col("id1") + 1)
        .select(graft.model.LinkModel.linkIdCol("id1").as("link_id"),
          col("x1"), col("y1"), col("x2"), col("y2"))
        .join(problems, Seq("link_id"), "left_semi")
      ProblemJoins.keepCompleteTiles(members, segments,
          areas.map(_.rect), areas.map(_.mapId.toLong))
        .write.mode("overwrite").parquet(s"$outDir/link_tiles.parquet")
      // per-partition lineage of the phase artifact (read-back, so the
      // metric covers what actually landed on disk)
      SplitPipeline.recordMetrics(
        spark.read.parquet(s"$outDir/link_tiles.parquet"),
        "handle-problem-list", outDir)
    }
    if (a.stopAfter == "handle-problem-list") return "handle-problem-list"

    // ---- phase: dist (assignment fan-out, partitioned by tile) -----
    // --max-areas: at most maxAreas tiles are written per pass
    // (reference Main.java:526, numPasses = ceil(areas / maxAreas)) —
    // the pass count is a resource knob and MUST NOT change results
    // (the reference's SolverAndProblemGeneratorTest asserts this
    // invariance; MainSpec does the same here). Chunks partition the
    // map_id space, so later passes append disjoint partitions.
    val assigned = TileAssigner.explodeByTile(assignment, a.mapid)
    val mapIds = areas.map(_.mapId)
    if (mapIds.size <= a.maxAreas)
      TileAssigner.writePartitioned(assigned, s"$outDir/tiles",
        a.handleElementVersion)
    else
      mapIds.grouped(a.maxAreas).zipWithIndex.foreach { case (chunk, pass) =>
        TileAssigner.writePartitioned(
          assigned.where(col("map_id").isin(chunk.map(Int.box): _*)),
          s"$outDir/tiles", a.handleElementVersion,
          mode = if (pass == 0) "overwrite" else "append")
      }
    SplitPipeline.recordMetrics(assigned, "dist", outDir)
    "dist"
  }

  def main(args: Array[String]): Unit =
    SplitterArgs.parse(args.toSeq) match {
      case Left(err) =>
        System.err.println(err)
        sys.exit(1)
      case Right(a) =>
        val spark = SparkSession.builder()
          .withExtensions(new graft.plans.GraftExtensions)
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        try {
          val last = run(spark, a)
          println(s"Completed phase: $last")
        } finally spark.stop()
    }
}
