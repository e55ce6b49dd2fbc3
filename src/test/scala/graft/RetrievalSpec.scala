package graft

import graft.operators.Retrieval

/** BM25 ranked retrieval: exact integer pipeline against a reference
  * computation, saturation/normalization ordering, and plan shape. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // reference computation mirroring the operator's exact arithmetic:
  // integer rationals throughout, idf via the round-6/truncate
  // quantization of Math.log (Spark's ln is Math.log under codegen)
  private def idfE6(nDocs: Long, df: Long): Long = {
    val x = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    // Spark's round(double, 6) goes through BigDecimal HALF_UP, then
    // the *1e6 product truncates on the long cast
    val r6 = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    (r6 * 1e6).toLong
  }
  private def scoreE6(tf: Long, dl: Long, idfE6: Long,
      avgdlE3: Long): Long = {
    val dE3 = tf * 1000 + 300 + (900 * dl * 1000) / avgdlE3
    idfE6 * ((2200 * tf * 1000000) / dE3) / 1000000
  }

  private val docs = Seq(
    (1L, "spark spark spark spark"),          // tf 4, dl 4
    (2L, "spark x"),                          // tf 1, dl 2
    (3L, "x y"),                              // no match
    (4L, "spark spark x y z w q r")           // tf 2, dl 8
  ).toDF("doc_id", "text")

  test("bm25: exact integer scores match the reference computation") {
    val out = Retrieval.bm25(docs, Seq("spark"), 10)
      .as[(Long, Long, Long)].collect().toList
    val (n, total) = (4L, 16L)
    val avgdlE3 = total * 1000 / n
    val idf = idfE6(n, 3)
    val expected = List(
      1L -> scoreE6(4, 4, idf, avgdlE3),
      2L -> scoreE6(1, 2, idf, avgdlE3),
      4L -> scoreE6(2, 8, idf, avgdlE3))
      .map { case (id, s) => (id, 1L, s) }
      .sortBy { case (id, _, s) => (-s, id) }
    assert(out == expected, s"got $out expected $expected")
  }

  test("bm25: tf saturates and length normalizes — more hits beats " +
    "fewer at equal length, shorter beats longer at equal tf; " +
    "non-matching docs are absent") {
    val out = Retrieval.bm25(docs, Seq("spark"), 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(!out.contains(3L), "doc without query terms must not score")
    assert(out(1L) > out(2L), "tf 4 in dl 4 must beat tf 1 in dl 2")
    assert(out(2L) > 0 && out(4L) > 0)
  }

  test("bm25: multi-term queries sum per-term scores and report " +
    "n_terms; top-k truncates on the total order") {
    val d2 = Seq(
      (1L, "spark join"),
      (2L, "spark spark"),
      (3L, "join join join")).toDF("doc_id", "text")
    val out = Retrieval.bm25(d2, Seq("spark", "join"), 2)
      .as[(Long, Long, Long)].collect().toList
    assert(out.length == 2, "limit respected")
    val both = Retrieval.bm25(d2, Seq("spark", "join"), 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(both(1L) == 2L && both(2L) == 1L && both(3L) == 1L)
  }

  test("q223 full plan: idf and stats broadcast, ranking is top-k " +
    "(no global sort), nothing cartesian on data") {
    val plan = Retrieval.bm25Query(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }
}
