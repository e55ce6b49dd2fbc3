package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchFunctions
import graft.operators.DistinctSketch

/** KMV bottom-k sketch (q181): the custom aggregate against a
  * brute-force reference (including partition-invariance, which is
  * what certifies `merge`), buffer edge cases, and the q181 pair
  * report's internal consistency + estimator accuracy. */
class KmvSketchSpec extends SparkSpec {

  private def kmvOf(values: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    import spark.implicits._
    SketchFunctions.register(spark)
    values.toDF("h").repartition(parts)
      .agg(SketchFunctions.kmvSketch(col("h"), k).as("kmv"))
      .head().getSeq[Long](0)
  }

  test("aggregate equals brute-force bottom-k distinct, any partitioning") {
    // deterministic pseudo-random multiset with planted duplicates
    val vs = (0 until 5000).map(i =>
      (i.toLong * 2654435761L + 97531L) % 1000L)
    val expect = vs.distinct.sorted.take(64)
    for (parts <- Seq(1, 7, 32))
      assert(kmvOf(vs, 64, parts) == expect, s"parts=$parts")
  }

  test("fewer distinct values than k yields the whole distinct set") {
    val vs = Seq(5L, 3L, 5L, 9L, 3L, 1L)
    assert(kmvOf(vs, 64, 3) == Seq(1L, 3L, 5L, 9L))
    assert(kmvOf(vs, 2, 3) == Seq(1L, 3L))
  }

  test("negative and extreme hash values order correctly") {
    val vs = Seq(Long.MaxValue, -1L, 0L, Long.MinValue, -1L, 7L)
    assert(kmvOf(vs, 3, 2) == Seq(Long.MinValue, -1L, 0L))
  }

  private lazy val rows =
    DistinctSketch.kmvJaccardQuery(spark, sf0001).collect()

  test("q181 pair report is internally consistent") {
    assert(rows.nonEmpty)
    val k = DistinctSketch.KmvK
    for (r <- rows) {
      val (n1, n2) = (r.getLong(2), r.getLong(3))
      val (kUsed, interK) = (r.getLong(6), r.getLong(7))
      val (exIn, exUn) = (r.getLong(8), r.getLong(9))
      assert(n1 > 0 && n1 <= k && n2 > 0 && n2 <= k)
      assert(kUsed <= k && kUsed >= math.max(n1, n2))
      assert(interK >= 0 && interK <= kUsed)
      assert(exIn >= 0 && exIn <= exUn)
      // union bottom-k saturates when both sketches are full
      if (n1 == k && n2 == k) assert(kUsed == k)
    }
  }

  test("q181 bottom-k Jaccard estimate tracks the exact Jaccard") {
    // k=64 gives ~1/sqrt(64) = 12.5% standard error; assert a loose
    // 3-sigma-ish envelope — the sketch values themselves are
    // hash-checked by the oracle, this guards the estimator semantics
    for (r <- rows) {
      val est = r.getLong(7).toDouble / r.getLong(6).toDouble
      val exact = r.getLong(8).toDouble / r.getLong(9).toDouble
      assert(math.abs(est - exact) <= 0.4,
        s"${r.getString(0)}/${r.getString(1)}: est $est vs exact $exact")
    }
  }

  test("fast-hash config keeps the report shape and consistency") {
    val fast = DistinctSketch
      .kmvJaccardQuery(spark, sf0001, portable = false).collect()
    assert(fast.length == rows.length)
    for (r <- fast) {
      assert(r.getLong(7) <= r.getLong(6))
      assert(r.getLong(8) <= r.getLong(9))
    }
  }
}
