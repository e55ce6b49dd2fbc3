package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression for the Hilbert-curve index.
  *
  * The xy2d recurrence carries rotation STATE from the top bit down —
  * each level's (x, y) depends on the previous level's, so a
  * composed-`when` formulation duplicates the operand subtrees at
  * every level and the expression grows ~5^bits nodes (measured: the
  * analyzer chokes long before bits = 10). The Morton key ([[
  * graft.operators.ZOrder.zkey]]) has independent per-bit terms and
  * composes fine; Hilbert is the textbook case where built-ins
  * genuinely cannot express the computation efficiently, so it gets
  * the same treatment as the dot product: a custom `Expression`
  * whose `doGenCode` emits the O(bits) loop inline in whole-stage
  * codegen.
  *
  * Semantics are pinned by ZOrderSpec: bijection onto [0, 4^bits),
  * unit-step adjacency, agreement with an in-test reference
  * recurrence, and the aligned-bucket = quadrant locality bound. The
  * DuckDB oracle runs the identical recurrence as a per-level
  * recursive CTE.
  */
case class HilbertIndexExpr(left: Expression, right: Expression,
                            bits: Int) extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  private val n1 = (1L << bits) - 1L

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += (1L << (2 * i)) * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { val t = n1 - y; y = n1 - x; x = t }
        else { val t = y; y = x; x = t }
      }
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (int $i = $bits - 1; $i >= 0; $i--) {
         |  long $rx = ($x >> $i) & 1L;
         |  long $ry = ($y >> $i) & 1L;
         |  $d += (1L << (2 * $i)) * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $t;
         |    if ($rx == 1L) { $t = ${n1}L - $y; $y = ${n1}L - $x; $x = $t; }
         |    else { $t = $y; $y = $x; $x = $t; }
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the curve expressions. */
object CurveFunctions {

  val hilbertName = "graft_hilbert"

  private val hilbertInfo = new ExpressionInfo(
    classOf[HilbertIndexExpr].getName, hilbertName)

  /** Shared SQL-side builder: validates arity up front so a call with
    * the wrong argument count fails with an analysis-readable message
    * naming the expected signature, not an IndexOutOfBoundsException.
    * Used by both registration sites ([[register]] and
    * [[graft.plans.GraftSparkExtensions]]). */
  def buildHilbert(children: Seq[Expression]): HilbertIndexExpr = {
    if (children.length != 3)
      throw new IllegalArgumentException(
        s"$hilbertName expects exactly 3 arguments " +
          s"(x BIGINT, y BIGINT, bits INT literal); got ${children.length}")
    val bits = children(2) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$hilbertName bits must be an INT literal, got $other")
    }
    HilbertIndexExpr(children(0), children(1), bits)
  }

  /** Idempotently register in a session's function registry. The
    * third argument must be a foldable INT literal (the key width). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier(hilbertName), hilbertInfo, buildHilbert _)
  }

  /** Codegen'd Hilbert index of two BIGINT cell coordinates.
    * Requires [[register]] on the session first. */
  def hilbert(x: Column, y: Column, bits: Int): Column =
    call_function(hilbertName, x, y, lit(bits))
}
