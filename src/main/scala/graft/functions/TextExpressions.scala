package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared shingling kernel, called from both the interpreted and the
  * generated code path of [[WordShinglesExpr]]. One virtual call per
  * ROW (not per element), tight loops, no lambda binding, no boxing. */
object ShingleUtil {
  private val SPACE = UTF8String.fromString(" ")

  /** Shared empty result; `def` so the generated Java code can call a
    * static forwarder. */
  def emptyArray(): ArrayData = EMPTY
  private val EMPTY: ArrayData = new GenericArrayData(new Array[Any](0))

  /** Distinct word n-grams of a token array, first-occurrence order —
    * same output as `array_distinct(transform(sequence(...), slice...))`
    * and DuckDB's `list_distinct(list_transform(range(...), ...))`. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      // concatWs copies bytes, so reusing `parts` across iterations is safe
      seen.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}

/** Codegen'd word-n-gram shingling: `graft_shingles(tokens, n)`.
  *
  * The higher-order-function formulation (`array_distinct(transform(
  * sequence(1, size-n+1), i => concat_ws(" ", slice(toks, i, n))))`)
  * is interpreted: every shingle pays lambda binding plus a full
  * re-evaluation of the lambda body's subtree — measured ~30µs per
  * shingle, which made shingle construction the dominant cost of the
  * n-gram-Jaccard and MinHash dedup operators (~8s of a 12s query at
  * sf0.1 for 260k shingles). This expression does the same work in a
  * compiled loop inside whole-stage codegen. Output is bit-identical
  * to the HOF formulation (asserted in DedupSimilaritySpec),
  * INCLUDING null input: the HOF's `when(size(toks) >= n, ...)
  * .otherwise(empty)` yields an empty array when `toks` is null
  * (size(null) -> null -> otherwise branch), so this expression is
  * null-INTOLERANT-free — null tokens also produce the empty array,
  * and the expression is never null.
  *
  * `n` must be a foldable integer (a literal in every engine use).
  */
case class WordShinglesExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable int), got $l and $r")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): Any = {
    val toks = left.eval(input)
    if (toks == null) ShingleUtil.emptyArray()
    else ShingleUtil.shingles(toks.asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      |${leftGen.code}
      |${rightGen.code}
      |$javaType ${ev.value} = ${leftGen.isNull}
      |  ? graft.functions.ShingleUtil.emptyArray()
      |  : graft.functions.ShingleUtil.shingles(${leftGen.value}, ${rightGen.value});
      """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Merge-scan kernel for [[SortedIntersectSizeExpr]] — one virtual
  * call per ROW, no per-pair hash set, no materialized intersection. */
object SortedIntersectUtil {
  /** |A ∩ B| for two SORTED string arrays (binary UTF8String order —
    * exactly `sort_array`'s). Duplicate runs count once, matching
    * `size(array_intersect(a, b))` set semantics on any input; on the
    * distinct arrays the dedup operators feed it the skip loops are
    * no-ops. */
  def sizeOf(a: ArrayData, b: ArrayData): Long = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n1 && j < n2) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else {
        c += 1
        i += 1; j += 1
        while (i < n1 && a.getUTF8String(i).equals(x)) i += 1
        while (j < n2 && b.getUTF8String(j).equals(x)) j += 1
      }
    }
    c
  }
}

/** Codegen'd sorted-set intersection SIZE: `graft_intersect_size(a, b)`
  * over two sorted string arrays.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side and
  * MATERIALIZES the intersection array (allocating copies of every
  * matching element) for every row, only for `size` to throw the
  * array away — measured as the dominant verification cost of the
  * PPJoin candidate check (~37µs per candidate pair at sf0.1, 2.5 s
  * of a 4 s query). When both inputs are already sorted (one
  * `sort_array` per DOC, amortized over every pair the doc appears
  * in), the same count is a single allocation-free merge scan per
  * pair. Inputs MUST be sorted ascending (sort_array's binary
  * order); null inputs yield 0 (the pair shares nothing observable),
  * and the result is never null. */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>), got $l and $r")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_intersect_size"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) 0L
    else SortedIntersectUtil.sizeOf(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
      |${leftGen.code}
      |${rightGen.code}
      |long ${ev.value} = (${leftGen.isNull} || ${rightGen.isNull})
      |  ? 0L
      |  : graft.functions.SortedIntersectUtil.sizeOf(${leftGen.value}, ${rightGen.value});
      """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the text expressions. */
object TextExpressionFunctions {

  val shinglesName = "graft_shingles"
  val intersectSizeName = "graft_intersect_size"

  private val shinglesInfo = new ExpressionInfo(
    classOf[WordShinglesExpr].getName, shinglesName)
  private val intersectSizeInfo = new ExpressionInfo(
    classOf[SortedIntersectSizeExpr].getName, intersectSizeName)

  /** Idempotently register in a session's registry — engine entry
    * points self-register, mirroring [[VectorFunctions.register]]. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier(shinglesName), shinglesInfo,
      (children: Seq[Expression]) =>
        WordShinglesExpr(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier(intersectSizeName), intersectSizeInfo,
      (children: Seq[Expression]) =>
        SortedIntersectSizeExpr(children(0), children(1)))
  }

  /** Codegen'd distinct word-n-gram shingles of a token array.
    * Requires [[register]] on the session first. */
  def wordShinglesFast(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(shinglesName, toks, lit(n))
  }

  /** Codegen'd |A ∩ B| over two SORTED string arrays (the caller
    * sorts once per doc). Requires [[register]] on the session. */
  def intersectSizeSorted(a: Column, b: Column): Column =
    call_function(intersectSizeName, a, b)
}
