package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The corpus's arithmetic link model, in ONE place: link L owns docs
 * 5L..5L+4, superlink S owns links 3S..3S+2; membership-edge parent
 * ids are offset so the three id spaces never collide. Shared by the
 * app driver, the catalog queries and their DuckDB oracle texts —
 * integer `div` everywhere (never double-divide + cast), so Spark and
 * the oracle engine compute identical ids.
 */
object LinkModel {
  val DocsPerLink = 5
  val LinksPerSuper = 3
  /** Offset of link ids in the membership-edge parent id space. */
  val LinkParentOffset = 1000000L
  /** Offset of superlink ids in the membership-edge parent id space. */
  val SuperParentOffset = 2000000L

  /** Link id of a doc-id column (Spark integer div). */
  def linkIdCol(docCol: String = "doc_id"): Column =
    expr(s"$docCol div $DocsPerLink")

  /** Same derivation as DuckDB SQL text. */
  def linkIdSql(docExpr: String = "doc_id"): String =
    s"$docExpr // $DocsPerLink"

  /** Superlink id of a link-id column (Spark integer div). */
  def superIdCol(linkCol: String = "link_id"): Column =
    expr(s"$linkCol div $LinksPerSuper")

  /** The member doc ids of a link, in span order. */
  def memberIdsCol(link: Column): Column =
    sequence(link * DocsPerLink, link * DocsPerLink + (DocsPerLink - 1))

  /** True for the doc ids that start a (doc, doc+1) segment — every
    * member except the link's last. */
  def segmentStartCol(docCol: String = "doc_id"): Column =
    expr(segmentStartSql(docCol))

  /** Same predicate as SQL text (valid in Spark SQL and DuckDB). */
  def segmentStartSql(docExpr: String = "doc_id"): String =
    s"$docExpr % $DocsPerLink < ${DocsPerLink - 1}"
}
