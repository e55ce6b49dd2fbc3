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

/** KMV (k-minimum-values, "bottom-k") distinct sketch as ONE custom
  * aggregate — `graft_kmv_sketch(hash_col, k)` → the k smallest
  * DISTINCT hash values of the group, sorted ascending.
  *
  * Beside CMS (frequency), HLL (cardinality) and AGMS (join size),
  * KMV is the sketch that supports SET ALGEBRA: the bottom-k of a
  * union is computable from the two bottom-k sketches alone, and the
  * fraction of the union's bottom-k present in both sketches is an
  * unbiased Jaccard estimator (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD'07;
  * Cohen & Kaplan's bottom-k sketches) — so per-source audience
  * sketches can answer overlap questions later, without the raw data.
  *
  * Why a [[TypedImperativeAggregate]] and not a window rank over
  * distinct keys: rank-per-group shuffles EVERY distinct (group, key)
  * pair; this buffer dedupes and caps at k per map task, so the
  * shuffle carries ≤ k longs per group per partition — the only
  * declarative-composable alternative with that posture would be a
  * sort_array(collect_set(...)) slice, whose buffer is unbounded.
  * Plans through ObjectHashAggregate with map-side partials; merge is
  * a sorted-distinct merge, so sketches are mergeable across
  * days/sources like the HLL registers.
  *
  * Buffer layout: slot 0 = current size n (≤ k), slots 1..n = the
  * values sorted ascending. Distinctness matters — a bottom-k over a
  * multiset must not count a repeated key twice — and insertion
  * rejects duplicates via the same binary search that finds the slot.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  def this(child: Expression, k: Expression) =
    this(child, MinHashSigAgg.foldToInt(k))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, foldable positive int)")

  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](k + 1)
    buf(0) = 0L
    buf
  }

  // binary search over buf[1..n]; returns insertion point as in
  // java.util.Arrays (negative-insertion encoding) — buf is small
  // (k+1 longs), so this is cache-resident
  private def search(buf: Array[Long], n: Int, v: Long): Int =
    java.util.Arrays.binarySearch(buf, 1, n + 1, v)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val raw = child.eval(input)
    if (raw != null) {
      val v = raw.asInstanceOf[Long]
      val n = buf(0).toInt
      // fast reject: full and not below the current k-th minimum
      if (n < k || v < buf(n)) {
        val idx = search(buf, n, v)
        if (idx < 0) { // absent — insert at the encoded point
          val at = -idx - 1
          val newN = if (n < k) n + 1 else n // full: max falls off
          var i = math.min(n, k - 1)
          while (i >= at) { buf(i + 1) = buf(i); i -= 1 }
          buf(at) = v
          buf(0) = newN.toLong
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val n1 = b1(0).toInt; val n2 = b2(0).toInt
    val out = new Array[Long](k + 1)
    var i = 1; var j = 1; var o = 0
    while (o < k && (i <= n1 || j <= n2)) {
      val take =
        if (i > n1) { val v = b2(j); j += 1; v }
        else if (j > n2) { val v = b1(i); i += 1; v }
        else if (b1(i) < b2(j)) { val v = b1(i); i += 1; v }
        else if (b2(j) < b1(i)) { val v = b2(j); j += 1; v }
        else { val v = b1(i); i += 1; j += 1; v } // equal: keep once
      out(o + 1) = take; o += 1
    }
    out(0) = o.toLong
    out
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.slice(1, buf(0).toInt + 1))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val n = buf(0).toInt
    val bb = ByteBuffer.allocate(8 * (n + 1))
    var i = 0
    while (i <= n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val buf = new Array[Long](k + 1)
    buf(0) = n.toLong
    var i = 1
    while (i <= n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_kmv_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Registration + Column API for the sketch aggregates. */
object SketchFunctions {

  val minHashSigName = "graft_minhash_sig"
  val kmvSketchName = "graft_kmv_sketch"

  private val info = new ExpressionInfo(
    classOf[MinHashSigAgg].getName, minHashSigName)
  private val kmvInfo = new ExpressionInfo(
    classOf[KmvSketchAgg].getName, kmvSketchName)

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier(minHashSigName), info,
      (children: Seq[Expression]) =>
        new MinHashSigAgg(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier(kmvSketchName), kmvInfo,
      (children: Seq[Expression]) =>
        new KmvSketchAgg(children(0), children(1)))
  }

  /** MinHash signature aggregate over a BIGINT hash column.
    * Requires [[register]] on the session first. */
  def minHashSig(hashCol: Column, numHashes: Int): Column =
    call_function(minHashSigName, hashCol, lit(numHashes))

  /** Bottom-k distinct sketch over a BIGINT hash column: the k
    * smallest distinct values, sorted ascending. Requires
    * [[register]] on the session first. */
  def kmvSketch(hashCol: Column, k: Int): Column =
    call_function(kmvSketchName, hashCol, lit(k))
}
