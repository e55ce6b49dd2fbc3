package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, OlapOps, TextAnalysis}

/** Unit locks for the round-11 selection/feature operators (q260-q262)
  * — the properties their oracles certify by hash are asserted here
  * directly, so a refactor fails fast with a named invariant instead
  * of a value diff. */
class SelectionOpsSpec extends SparkSpec {

  test("q260 RANGE frame admits every same-day order, not just preceding rows") {
    // crafted frame: one customer, three orders on one day + one 40
    // days later — a ROWS frame would give the 2nd same-day order a
    // partial window; the RANGE frame must give all three the full
    // same-day count, and the late order must see only itself
    import org.apache.spark.sql.expressions.Window
    val df = spark.createDataFrame(Seq(
      (1L, 10L, 100L, 500L), (1L, 11L, 100L, 700L),
      (1L, 12L, 100L, 900L), (1L, 13L, 140L, 100L)))
      .toDF("o_custkey", "o_orderkey", "day", "cents")
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-29, 0)
    val got = df.select(col("o_orderkey"),
        count(lit(1)).over(w).as("n"), sum("cents").over(w).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(10L) == ((3L, 2100L)) && got(11L) == ((3L, 2100L)) &&
      got(12L) == ((3L, 2100L)), s"RANGE frame must span the day: $got")
    assert(got(13L) == ((1L, 100L)), "day 140 sees nothing from day 100")
  }

  test("q260 over the fixture: every order counts itself") {
    val rows = OlapOps.trailingWindowQuery(spark, sf0001)
    assert(rows.filter(col("n_orders_30d") < 1).count() == 0)
    assert(rows.count() > 0)
  }

  test("q261 skyline satisfies the textbook dominance definition") {
    val pts = Curation.skylineQuery(spark, sf0001)
      .select("clean_e4", "n_words", "is_frontier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def dominated(q: Long, l: Long) = pts.exists { case (q2, l2, _) =>
      q2 >= q && l2 >= l && (q2 > q || l2 > l)
    }
    pts.foreach { case (q, l, f) =>
      assert((f == 1) == !dominated(q, l),
        s"($q, $l) flagged $f but dominated=${dominated(q, l)}")
    }
    assert(pts.exists(_._3 == 1), "frontier must be nonempty")
    assert(pts.exists(_._3 == 0), "fixture must have dominated docs")
  }

  test("q262 features: buckets in range, ranks contiguous from 1, k-capped") {
    val f = TextAnalysis.hashedFeaturesQuery(spark, sf0001)
      .localCheckpoint()
    assert(f.filter(col("bucket") < 0 ||
      col("bucket") >= TextAnalysis.FeatureBuckets).count() == 0)
    assert(f.filter(col("rank") > TextAnalysis.FeatureTopK).count() == 0)
    // ranks per doc are exactly 1..n with counts non-increasing
    val bad = f.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0, "ranks must be contiguous from 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("rank")
    assert(f.withColumn("prev", lag("cnt", 1).over(w))
      .filter(col("prev").isNotNull && col("cnt") > col("prev"))
      .count() == 0, "counts must be non-increasing in rank")
  }
}
