package graft.functions

import graft.index.TileIndex
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * Codegen'd cell-bucketed probes for the problem theta-joins: instead
 * of a BroadcastNestedLoopJoin evaluating the geometric predicate
 * against EVERY tile, each row probes the broadcast [[TileIndex]] for
 * the candidate tiles of the grid cells its bbox/segment covers and
 * the index applies the exact residual predicate — the J4/J5 analog
 * of the point probe in [[ProbeTilesExpr]] (reference
 * `AreaGrid.java:213-233` consumed by
 * `MultiTileProcessor.java:596-608,669-675`). Output is the array of
 * matching tile POSITIONS (index order), to be exploded and mapped to
 * map ids; rows matching nothing produce an empty array, which
 * `explode` drops like the inner join did.
 */
case class ProbeRectTilesExpr(first: Expression, second: Expression,
                              third: Expression, fourth: Expression,
                              bc: Broadcast[TileIndex])
  extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // nullable derives from the children (the Binary/Quaternary default):
  // a NULL coordinate yields a NULL array, which the consuming explode
  // drops — the same fate the replaced join predicate gave such rows.
  // (A hardcoded false would make codegen skip the child null checks
  // and probe with default-0 coordinates.)
  override def prettyName: String = "probe_rect_tiles"

  override def nullSafeEval(minLat: Any, minLon: Any,
                            maxLat: Any, maxLon: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(bc.value.probeRect(
      minLat.asInstanceOf[Int], minLon.asInstanceOf[Int],
      maxLat.asInstanceOf[Int], maxLon.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("probeRectBc", bc, classOf[Broadcast[_]].getName)
    val idxCls = classOf[TileIndex].getName
    val idxVar = ctx.addMutableState(idxCls, "probeRectIndex",
      v => s"$v = ($idxCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (minLat, minLon, maxLat, maxLon) =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($idxVar.probeRect($minLat, $minLon, $maxLat, $maxLon));"""
        .stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Segment variant: children are (x1, y1, x2, y2) with x = lon,
  * y = lat; matches tiles whose rect the closed segment crosses. */
case class ProbeSegmentTilesExpr(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression,
                                 bc: Broadcast[TileIndex])
  extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // nullable derives from the children (the Binary/Quaternary default):
  // a NULL coordinate yields a NULL array, which the consuming explode
  // drops — the same fate the replaced join predicate gave such rows.
  // (A hardcoded false would make codegen skip the child null checks
  // and probe with default-0 coordinates.)
  override def prettyName: String = "probe_segment_tiles"

  override def nullSafeEval(x1: Any, y1: Any, x2: Any, y2: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(bc.value.probeSegment(
      x1.asInstanceOf[Int], y1.asInstanceOf[Int],
      x2.asInstanceOf[Int], y2.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("probeSegBc", bc, classOf[Broadcast[_]].getName)
    val idxCls = classOf[TileIndex].getName
    val idxVar = ctx.addMutableState(idxCls, "probeSegIndex",
      v => s"$v = ($idxCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (x1, y1, x2, y2) =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($idxVar.probeSegment($x1, $y1, $x2, $y2));"""
        .stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object ProbeRectExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column wrapper: candidate-filtered tile positions for a bbox. */
  def probeRectTiles(minLat: Column, minLon: Column, maxLat: Column,
                     maxLon: Column, bc: Broadcast[TileIndex]): Column =
    ColumnBridge.column(ProbeRectTilesExpr(
      ColumnBridge.expression(minLat), ColumnBridge.expression(minLon),
      ColumnBridge.expression(maxLat), ColumnBridge.expression(maxLon), bc))

  /** Column wrapper: tile positions crossed by a segment. */
  def probeSegmentTiles(x1: Column, y1: Column, x2: Column, y2: Column,
                        bc: Broadcast[TileIndex]): Column =
    ColumnBridge.column(ProbeSegmentTilesExpr(
      ColumnBridge.expression(x1), ColumnBridge.expression(y1),
      ColumnBridge.expression(x2), ColumnBridge.expression(y2), bc))
}
