package graft

import org.apache.spark.sql.functions._
import graft.functions.TextExpressionFunctions

/** `graft_intersect_size` (sorted-merge overlap count, round-18
  * optimization) must equal `size(array_intersect(a, b))` on every
  * input shape it replaces it for: real fixture shingle arrays,
  * duplicates (set semantics — dup runs count once), empties, nulls. */
class IntersectSizeSpec extends SparkSpec {

  test("matches size(array_intersect) on real sorted shingle arrays") {
    TextExpressionFunctions.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val sh = docs.select(col("doc_id"),
      sort_array(TextExpressionFunctions.wordShinglesFast(
        split(trim(lower(col("text"))), "\\s+"), 3)).as("s"))
      .filter(size(col("s")) > 0)
      .limit(60).localCheckpoint()
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
    val bad = pairs.filter(
      TextExpressionFunctions.intersectSizeSorted(col("s1"), col("s2"))
        =!= size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .count()
    assert(bad == 0)
    // and the overlap is non-trivially exercised
    val some = pairs.filter(
      TextExpressionFunctions.intersectSizeSorted(col("s1"), col("s2")) > 0)
      .count()
    assert(some > 0)
  }

  test("set semantics on duplicates, empties and nulls") {
    TextExpressionFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
      (Seq("a", "a", "b", "c"), Seq("a", "b", "b", "d")), // dups -> 2
      (Seq.empty[String], Seq("a")),                      // empty -> 0
      (Seq("x"), Seq.empty[String]),                      // empty -> 0
      (Seq("a", "b"), Seq("a", "b"))                      // full  -> 2
    )).toDF("s1", "s2")
    val rows = df.select(
      TextExpressionFunctions.intersectSizeSorted(col("s1"), col("s2"))
        .as("n"),
      size(array_intersect(col("s1"), col("s2"))).cast("long").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // null input -> 0 (array_intersect yields null there; the
    // expression's contract is the observable-overlap count)
    val n = spark.createDataFrame(Seq(Tuple1(Seq("a"))))
      .toDF("s1")
      .select(TextExpressionFunctions.intersectSizeSorted(
        col("s1"), lit(null).cast("array<string>")).as("n"))
      .head().getLong(0)
    assert(n == 0L)
  }
}
