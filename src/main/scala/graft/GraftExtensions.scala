package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Session-extension entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT graft_dot(a, b) ...")` works
  * anywhere the library is on the classpath.
  *
  * Activate with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic, or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
    // plans the custom top-k-per-group logical node (partial + final
    // bounded heaps around a hash exchange) — see graft.plans.TopKPerGroup
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  private[graft] val dotBuilder: Seq[Expression] => Expression = children => {
    require(children.length == 2, "graft_dot(arrayA, arrayB) takes 2 arguments")
    // Cast to array<double> so SQL callers can pass array<float>/array<int>
    // (DotProduct itself rejects non-double storage at analysis time);
    // non-array arguments fail Cast's own analysis check.
    val widened = children.map(Cast(_, ArrayType(DoubleType)))
    DotProduct(widened.head, widened(1))
  }

  /** Register graft's SQL functions on an already-running session (the
    * extensions path only applies when the session is first built). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftglue.registerFunction(spark, "graft_dot", dotBuilder)
}
