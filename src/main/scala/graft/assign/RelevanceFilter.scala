package graft.assign

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * P5: the configurable relation-relevance predicate of problem-list
 * generation (reference `ProblemListProcessor.java:76-95,201-243`):
 * a relation is considered for the problem list if
 *
 *  - its type is directly wanted (restriction / through_route /
 *    restriction:* / associatedStreet / street), or
 *  - it is a multipolygon/boundary relation whose `boundary` tag is
 *    wanted — by default everything NOT in the exclude list
 *    {administrative, postal_code, political}, or exactly the values
 *    of a user-supplied `--boundary-tags` list — or that has no
 *    boundary tag at all, or
 *  - it is a multipolygon/boundary relation with a boundary tag whose
 *    `admin_level` falls in [max(2, --wanted-admin-level), 11]
 *    (reference `setWantedAdminLevel:88-95`).
 *
 * The predicate is a pure boolean Column, so it pushes into the link
 * scan and stays inside whole-stage codegen. The corpus carries no
 * real tags, so [[relTypeCol]]/[[boundaryCol]]/[[adminLevelCol]]
 * derive a deterministic tag model from the link id with arithmetic
 * that the DuckDB oracle reproduces verbatim ([[relTypeSql]] etc.).
 */
object RelevanceFilter {

  val UseExcludeList = "use-exclude-list"
  val DefaultWantedAdminLevel = 5

  /** Reference's default exclude list for the boundary tag
    * (`ProblemListProcessor.java:196-198`). */
  val ExcludedBoundaryValues: Seq[String] =
    Seq("administrative", "postal_code", "political")

  /** Relation types accepted regardless of boundary tags
    * (`processRelation:211-218`). */
  val DirectTypes: Seq[String] =
    Seq("restriction", "through_route", "associatedStreet", "street")

  /** Relation types subject to the boundary-tag rules. */
  val MpTypes: Seq[String] = Seq("multipolygon", "boundary")

  /**
   * The relevance predicate over tag columns. `boundaryTags` is
   * either [[UseExcludeList]] or a comma-separated include list,
   * exactly the `--boundary-tags` surface.
   */
  def relevant(relType: Column, boundary: Column, adminLevel: Column,
               boundaryTags: String = UseExcludeList,
               wantedAdminLevel: Int = DefaultWantedAdminLevel): Column = {
    val useDirect = relType.isInCollection(DirectTypes) ||
      relType.startsWith("restriction:")
    val isMp = relType.isInCollection(MpTypes)
    val hasBoundary = boundary.isNotNull
    val isWanted =
      if (boundaryTags == UseExcludeList)
        when(hasBoundary, !boundary.isInCollection(ExcludedBoundaryValues))
          .otherwise(lit(true))
      else
        when(hasBoundary,
          boundary.isInCollection(boundaryTags.split(",").toSeq))
          .otherwise(lit(false))
    val lo = math.max(2, wantedAdminLevel)
    val adminOk = adminLevel.isNotNull &&
      adminLevel >= lo && adminLevel <= 11
    useDirect || (isMp && (isWanted || !hasBoundary)) ||
      (isMp && hasBoundary && adminOk)
  }

  /** DuckDB text of the same predicate over tag expressions. */
  def relevantSql(relType: String, boundary: String, adminLevel: String,
                  boundaryTags: String = UseExcludeList,
                  wantedAdminLevel: Int = DefaultWantedAdminLevel): String = {
    def inList(e: String, vs: Seq[String]) =
      s"$e IN ${vs.map(v => s"'$v'").mkString("(", ", ", ")")}"
    val useDirect =
      s"(${inList(relType, DirectTypes)} OR $relType LIKE 'restriction:%')"
    val isMp = s"(${inList(relType, MpTypes)})"
    val isWantedOrNoTag =
      if (boundaryTags == UseExcludeList)
        s"($boundary IS NULL OR NOT ${inList(boundary, ExcludedBoundaryValues)})"
      else
        s"($boundary IS NULL OR ${inList(boundary, boundaryTags.split(",").toSeq)})"
    val lo = math.max(2, wantedAdminLevel)
    val adminOk =
      s"($boundary IS NOT NULL AND $adminLevel BETWEEN $lo AND 11)"
    s"($useDirect OR ($isMp AND $isWantedOrNoTag) OR ($isMp AND $adminOk))"
  }

  // ---- deterministic tag model of the synthetic corpus -------------------
  // link_id -> (rel_type, boundary, admin_level), arithmetic only so
  // Spark and the oracle derive identical tags. "route" is a type the
  // predicate never accepts — the negative case.

  private val RelTypes =
    Seq("multipolygon", "boundary", "restriction", "associatedStreet", "route")
  private val BoundaryValues = Seq("administrative", "postal_code", "census")

  def relTypeCol(linkId: Column): Column =
    element_at(array(RelTypes.map(lit): _*), (linkId % 5 + 1).cast("int"))

  def boundaryCol(linkId: Column): Column =
    when(linkId % 4 === 0, lit(null).cast("string"))
      .otherwise(element_at(array(BoundaryValues.map(lit): _*),
        (linkId % 4).cast("int")))

  def adminLevelCol(linkId: Column): Column =
    when(linkId % 3 === 0, lit(null).cast("long"))
      .otherwise(lit(2L) + linkId % 10)

  def relTypeSql(linkId: String): String =
    s"(CASE ($linkId) % 5 " +
      RelTypes.zipWithIndex.map { case (t, i) => s"WHEN $i THEN '$t'" }
        .mkString(" ") + " END)"

  def boundarySql(linkId: String): String =
    s"(CASE ($linkId) % 4 WHEN 0 THEN NULL " +
      BoundaryValues.zipWithIndex.map { case (v, i) => s"WHEN ${i + 1} THEN '$v'" }
        .mkString(" ") + " END)"

  def adminLevelSql(linkId: String): String =
    s"(CASE WHEN ($linkId) % 3 = 0 THEN NULL ELSE 2 + ($linkId) % 10 END)"
}
