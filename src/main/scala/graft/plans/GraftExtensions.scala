package graft.plans

import graft.functions.{DotF64Expr, H3LiteEncodeExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/**
 * Session extension registering the engine's pure custom Catalyst
 * expressions as SQL functions, so `spark.sql` users get the same
 * codegen'd kernels the Column API exposes:
 *
 *  - `h3lite_encode(lat_mu, lon_mu, res)` — hierarchical cell id
 *  - `dot_f64(a, b)` — bit-exact float64 dot product over
 *    array<float|double>
 *
 * (The tile probes stay Column-only: they close over a broadcast
 * [[graft.index.TileIndex]], which a name-resolved SQL function
 * cannot carry.) Install with
 * `SparkSession.builder().withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.plans.GraftExtensions` — the engine's
 * own mains do the former, so every CLI/Verify/Bench session speaks
 * these functions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("h3lite_encode"),
      new ExpressionInfo(classOf[H3LiteEncodeExpr].getName, "h3lite_encode"),
      h3liteBuilder))
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64Expr].getName, "dot_f64"),
      dotF64Builder))
  }
}

object GraftExtensions {
  /** THE SQL builder for h3lite_encode — every registration path
    * (session extension, temp-function register) must use this one so
    * the same SQL text behaves identically everywhere: lat/lon are
    * cast to INT, the resolution must be a bare INT literal. */
  private[graft] val h3liteBuilder: Seq[Expression] => Expression = args => {
    if (args.length != 3) throw new IllegalArgumentException(
      "h3lite_encode(lat_mu, lon_mu, res) takes 3 arguments")
    val res = args(2) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        "h3lite_encode resolution must be an INT literal, got " + other.sql)
    }
    H3LiteEncodeExpr(
      Cast(args(0), IntegerType), Cast(args(1), IntegerType), res)
  }

  private[graft] val dotF64Builder: Seq[Expression] => Expression = args => {
    if (args.length != 2) throw new IllegalArgumentException(
      "dot_f64(a, b) takes 2 arguments")
    DotF64Expr(args(0), args(1))
  }
}
