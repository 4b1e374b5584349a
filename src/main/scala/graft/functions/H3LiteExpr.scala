package graft.functions

import graft.geo.H3Lite
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Codegen'd hierarchical cell encode: `h3lite_encode(lat_mu, lon_mu)`
 * -> 64-bit cell id at a fixed resolution (the north-star's custom
 * cell-encode expression: null-intolerant, deterministic, inlined
 * into whole-stage codegen as a static call — no UDF boxing).
 */
case class H3LiteEncodeExpr(left: Expression, right: Expression, res: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "h3lite_encode"

  override def nullSafeEval(lat: Any, lon: Any): Any =
    H3Lite.encode(lat.asInstanceOf[Int], lon.asInstanceOf[Int], res)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, lon) =>
      s"${ev.value} = graft.geo.H3Lite.encode($lat, $lon, $res);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object H3LiteExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  def h3liteEncode(lat: Column, lon: Column, res: Int): Column =
    ColumnBridge.column(H3LiteEncodeExpr(
      ColumnBridge.expression(lat.cast("int")),
      ColumnBridge.expression(lon.cast("int")), res))

  /** SQL registration: `h3lite_encode(lat, lon, res)` usable from
    * `spark.sql` — delegates to the SAME builder the
    * [[graft.plans.GraftExtensions]] session extension injects, so
    * both registration paths accept and reject identical SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "h3lite_encode", graft.plans.GraftExtensions.h3liteBuilder,
      "scala_udf")
}
