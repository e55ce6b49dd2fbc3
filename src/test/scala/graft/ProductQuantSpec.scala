package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuant

class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  // Planted codebook structure: anchors 0..7 are constant vectors at
  // well-separated levels ((j+1)*0.5 in every dim — quantized gap 512
  // per dim, inter-anchor sub-d2 16*512^2); "family" vectors perturb
  // an anchor by ±0.001 (±1 quantized unit, own-centroid d2 <= 16).
  private def vec(level: Double, jitter: Double = 0.0): Array[Float] =
    Array.tabulate(64)(i => (level + (if (i % 3 == 0) jitter else 0.0)).toFloat)

  private lazy val planted = {
    val anchors = (0 until 8).map(j => (j.toLong, vec((j + 1) * 0.5), 0L))
    val fam0 = (10 until 20).map(i =>
      (i.toLong, vec(0.5, 0.001 * (i % 3 - 1)), 0L))
    val fam1 = (20 until 25).map(i =>
      (i.toLong, vec(1.0, 0.001 * (i % 3 - 1)), 1L))
    (anchors ++ fam0 ++ fam1).toDF("vec_id", "embedding", "label")
  }

  test("codes: every family member encodes to its anchor's code in " +
    "all subspaces") {
    val c = ProductQuant.codes(planted).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(c.size == planted.count() * ProductQuant.SubSpaces)
    for (i <- 10L until 20L; s <- 0 until ProductQuant.SubSpaces)
      assert(c((i, s)) == 0L, s"vec $i sub $s: ${c((i, s))}")
    for (i <- 20L until 25L; s <- 0 until ProductQuant.SubSpaces)
      assert(c((i, s)) == 1L, s"vec $i sub $s: ${c((i, s))}")
    // anchors are their own nearest centroid
    for (j <- 0L until 8L; s <- 0 until ProductQuant.SubSpaces)
      assert(c((j, s)) == j)
  }

  test("ADC top-k on planted structure recovers the exact family: " +
    "recall 100") {
    val r = ProductQuant.pqRecall(planted, queryId = 0L, k = 10)
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L,
      s"expected 10/10, got ${r.getLong(1)}/${r.getLong(0)}")
    assert(r.getLong(2) == 100L)
    // and the top-k itself is exactly the anchor-0 family
    val ids = ProductQuant.pqTopK(planted, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(ids == (10L until 20L).toSet, s"got $ids")
  }

  test("sf0.001 recall report is well-formed; adist is the exact " +
    "integer ADC sum") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val r = ProductQuant.pqRecall(emb, queryId = 0L, k = 10).collect().head
    assert(r.getLong(0) == 10L)
    assert(r.getLong(1) >= 0L && r.getLong(1) <= 10L)
    assert(r.getLong(2) == r.getLong(1) * 100 / r.getLong(0))
    val top = ProductQuant.pqTopK(emb, queryId = 0L, k = 10).collect()
    assert(top.length == 10)
    // ascending adist with vec_id tie-break — the deterministic order
    assert(top.sliding(2).forall { case Array(a, b) =>
      a.getLong(1) < b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0))
    })
  }
}
