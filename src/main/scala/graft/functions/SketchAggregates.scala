package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** MinHash signature as ONE custom aggregate —
  * `graft_minhash_sig(hash_col, numHashes)`.
  *
  * The composed formulation (`numHashes` separate
  * `min(xxhash64(h, i))` aggregate expressions) is semantically
  * identical but generates an enormous whole-stage-codegen class
  * (64 buffer slots each with its own update code — large enough that
  * a handful of such plans overflowed the generated-class cache and
  * caused seconds of recompilation per bench round). A
  * [[TypedImperativeAggregate]] is the idiomatic Spark shape for a
  * sketch: one `Array[Long]` buffer, a tight update loop, elementwise
  * min on merge. It plans through ObjectHashAggregate with map-side
  * partial aggregation, so the shuffle still carries one buffer per
  * doc — the same scale posture as the composed form, with a
  * constant-size generated class. Output is bit-identical to
  * `min(xxhash64(h, lit(i)))` per slot (asserted in
  * DedupSimilaritySpec): update applies the same two-long xxhash64
  * chain (seed 42) Spark's `xxhash64(h, i)` evaluates.
  */
case class MinHashSigAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  def this(child: Expression, n: Expression) =
    this(child, MinHashSigAgg.foldToInt(n))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && numHashes > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, foldable positive int)")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // same chain as the XxHash64 expression over (h, lit(i)): seed
      // 42, fold each value in order — the INT literal folds through
      // hashInt, not hashLong
      val base = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var i = 0
      while (i < numHashes) {
        val p = XXH64.hashInt(i, base)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_minhash_sig"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  private[functions] def foldToInt(e: Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      "numHashes must be a foldable int literal")
    e.eval().asInstanceOf[Int]
  }
}

/** Registration + Column API for the sketch aggregates. */
object SketchFunctions {

  val minHashSigName = "graft_minhash_sig"

  private val info = new ExpressionInfo(
    classOf[MinHashSigAgg].getName, minHashSigName)

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier(minHashSigName), info,
      (children: Seq[Expression]) =>
        new MinHashSigAgg(children(0), children(1)))
  }

  /** MinHash signature aggregate over a BIGINT hash column.
    * Requires [[register]] on the session first. */
  def minHashSig(hashCol: Column, numHashes: Int): Column =
    call_function(minHashSigName, hashCol, lit(numHashes))
}
