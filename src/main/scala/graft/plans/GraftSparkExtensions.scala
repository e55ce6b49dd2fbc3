package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CurveFunctions, DotProductFloat, HilbertIndexExpr, TextExpressionFunctions, VectorFunctions, WordShinglesExpr}

/** SparkSessionExtensions entry point: makes the engine's custom
  * expressions available to ANY session (including pure-SQL users)
  * via `--conf spark.sql.extensions=graft.plans.GraftSparkExtensions`.
  *
  * Library-API users get the same functions through
  * [[graft.functions.VectorFunctions.register]], which the Similarity /
  * Dedup entry points call on their own session — the extension path
  * exists so that the SQL passthrough surface (SURVEY §2.11) can use
  * `graft_dot(...)` with no Scala involved.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(VectorFunctions.dotName),
      new ExpressionInfo(classOf[DotProductFloat].getName,
        VectorFunctions.dotName),
      (children: Seq[Expression]) =>
        DotProductFloat(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier(TextExpressionFunctions.shinglesName),
      new ExpressionInfo(classOf[WordShinglesExpr].getName,
        TextExpressionFunctions.shinglesName),
      (children: Seq[Expression]) =>
        WordShinglesExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier(CurveFunctions.hilbertName),
      new ExpressionInfo(classOf[HilbertIndexExpr].getName,
        CurveFunctions.hilbertName),
      CurveFunctions.buildHilbert _))
  }
}
