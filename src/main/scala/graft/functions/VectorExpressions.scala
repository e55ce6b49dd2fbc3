package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding arithmetic.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is interpreted — every
  * element pays lambda-binding and boxing overhead outside whole-stage
  * codegen. For a 64-dim float vector that is ~128 interpreted
  * evaluations per row where a tight primitive loop costs nanoseconds.
  * This is the one place in the engine where Spark's built-ins
  * genuinely cannot express the computation efficiently, so it gets a
  * custom `Expression` with `doGenCode` (preference order per the
  * design notes: compose built-ins > custom Expression > custom plan >
  * mapPartitions).
  *
  * Accumulation is sequential in array order, in double precision —
  * bit-identical to the HOF formulation it replaces.
  */
case class DotProductFloat(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the vector expressions. */
object VectorFunctions {

  val dotName = "graft_dot"

  private val dotInfo = new ExpressionInfo(
    classOf[DotProductFloat].getName, dotName)

  /** Idempotently register the functions in a session's registry —
    * callable on any session (including one created by an external
    * harness), so library entry points self-register. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier(dotName), dotInfo,
      (children: Seq[Expression]) => DotProductFloat(children(0), children(1)))
  }

  /** Codegen'd dot product of two ARRAY<FLOAT> columns (double out).
    * Requires [[register]] on the session first. */
  def dot(a: Column, b: Column): Column = call_function(dotName, a, b)

  /** Codegen'd cosine similarity built from the dot expression. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
