package graft.functions

import graft.index.TileIndex
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * Codegen'd broadcast spatial-join probe: `probe_tiles(lat, lon)` ->
 * array<int> of tile ids whose (overlap-extended) rectangle contains
 * the point, optionally falling back to the nearest tile so the join
 * is total.
 *
 * This is the build-side probe of the engine's point-in-rectangle
 * join expressed as a native Catalyst expression — it stays inside
 * whole-stage codegen (one virtual call per row into the broadcast
 * [[TileIndex]], no UDF encoder boxing), replacing the reference's
 * AreaGrid probe inside its writer loop
 * (`SplitProcessor.writeNode:256-322`, `AreaGrid.java:213-233`).
 */
case class ProbeTilesExpr(left: Expression, right: Expression,
                          bc: Broadcast[TileIndex], nearestFallback: Boolean)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // nullable derives from the children (the Binary/Quaternary default):
  // a NULL coordinate yields a NULL array, which the consuming explode
  // drops — the same fate the replaced join predicate gave such rows.
  // (A hardcoded false would make codegen skip the child null checks
  // and probe with default-0 coordinates.)
  override def prettyName: String = "probe_tiles"

  @transient private lazy val index: TileIndex = bc.value

  override def nullSafeEval(lat: Any, lon: Any): Any = {
    val ids =
      if (nearestFallback) index.probeOrNearest(lat.asInstanceOf[Int], lon.asInstanceOf[Int])
      else index.probe(lat.asInstanceOf[Int], lon.asInstanceOf[Int])
    UnsafeArrayData.fromPrimitiveArray(ids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("probeBc", bc, classOf[Broadcast[_]].getName)
    val idxCls = classOf[TileIndex].getName
    val idxVar = ctx.addMutableState(idxCls, "probeIndex",
      v => s"$v = ($idxCls) $bcRef.value();")
    val method = if (nearestFallback) "probeOrNearest" else "probe"
    nullSafeCodeGen(ctx, ev, (lat, lon) =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($idxVar.$method($lat, $lon));""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ProbeTilesExpr {
  /** Column wrapper: `probeTiles(lat, lon, bcIndex, fallback)`. */
  def probeTiles(lat: Column, lon: Column, bc: Broadcast[TileIndex],
                 nearestFallback: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      ProbeTilesExpr(ColumnBridge.expression(lat),
        ColumnBridge.expression(lon), bc, nearestFallback))
  }
}
