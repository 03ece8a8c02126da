package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`)
  * evaluate their lambdas INTERPRETED — one closure dispatch per array
  * element per row. Inside an all-pairs similarity join that cost is
  * multiplied by O(n²) pairs and dominates the query. `DotProduct` is a
  * `BinaryExpression` with `doGenCode`, so the whole pair loop stays
  * inside whole-stage codegen: a tight `double` loop over the two
  * `ArrayData`, no closures, no boxing.
  *
  * Float-op order is the same sequential left-to-right sum the
  * interpreted `aggregate(zip_with(...))` formulation used, so results
  * are bit-identical to the previous implementation (and to the DuckDB
  * oracle's `list_cosine_similarity` at 6-decimal rounding).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ArrayData.getDouble is only valid on array<double> storage — reject
  // anything else at ANALYSIS time rather than returning garbage. The
  // registered `graft_dot` SQL builder casts its inputs first, so
  // array<float>/array<int> arguments still work through SQL; only a
  // direct mistyped construction fails here.
  override def checkInputDataTypes(): TypeCheckResult = {
    def bad(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => false
      case _                        => true
    }
    Seq(left, right).find(bad) match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<double> inputs, got ${e.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Σ aᵢ·bᵢ over two array<double> columns, whole-stage-codegen'd. */
  def dot(a: Column, b: Column): Column =
    columnOf(DotProduct(expressionOf(a), expressionOf(b)))
}
