package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

import graft.functions.{CosineSim, DotProduct, HammingDist, NfcNormalize, PackSignBits, QuantizeInt8, SqDist, UrlDomains}

/** Catalyst integration point: registers graft's native codegen
  * expressions as SQL functions, so `spark.sql` users (and BI tools
  * speaking SQL at the engine) reach the same whole-stage-codegen
  * kernels the Column API uses — no UDF fallback anywhere.
  *
  * Two front doors, same registrations:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the `SparkSessionExtensions` route Delta/Iceberg use);
  *  - per-session: `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def binary(name: String, f: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects exactly 2 arguments, got ${args.length}")
      f(args(0), args(1))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(f(null, null).getClass.getName, name), builder)
  }

  private def unary(name: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects exactly 1 argument, got ${args.length}")
      f(args(0))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(f(null).getClass.getName, name), builder)
  }

  private def ternary(name: String,
      f: (Expression, Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == 3, s"$name expects exactly 3 arguments, got ${args.length}")
      f(args(0), args(1), args(2))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo(f(null, null, null).getClass.getName, name), builder)
  }

  /** The SQL function surface: name → expression builder. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      binary("graft_dot", DotProduct.apply),
      binary("graft_cosine", CosineSim.apply),
      binary("graft_sqdist", SqDist.apply),
      unary("graft_nfc_normalize", NfcNormalize.apply),
      unary("graft_url_domains", UrlDomains.apply),
      unary("graft_pack_signbits", PackSignBits.apply),
      binary("graft_hamming", HammingDist.apply),
      ternary("graft_quantize_int8", QuantizeInt8.apply))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[SparkSession].sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}
