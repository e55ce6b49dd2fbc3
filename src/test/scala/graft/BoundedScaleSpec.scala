package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{OlapOps, PrepPipeline, TextAnalysis}

/** Stress tests for the CONSTANT-BOUNDED assumptions the scale
  * scaladocs claim: each case pushes a bound to (or past) realistic
  * cardinality and asserts both the results and the plan shape — no
  * single-partition corpus window, no unbounded driver state, no
  * quadratic fan-out — so a refactor can't silently regress the bound.
  */
class BoundedScaleSpec extends SparkSpec {
  import spark.implicits._

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("vocab build at vocabSize 30k: id window input stays limit-bounded") {
    val df = TextAnalysis.vocabQuery(spark, sf0001,
      minCount = 1L, vocabSize = 30000)
    // the unpartitioned id window may only ever see the top-vocabSize
    // rows: its child subtree must carry the limit (TakeOrderedAndProject
    // below the topK fallback threshold, Sort+GlobalLimit above it) —
    // never the raw corpus-sized term table
    val p = planString(df)
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"),
      "id window must sit above a bounded (limit) input:\n" + p.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 30000)
    // ids stay contiguous from 1 and ordered by (cnt DESC, term ASC)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("packing offsets: a 2^40 doc_id range engages the block clamp") {
    val top = 1L << 40
    val bs = PrepPipeline.derivedBlockSize(0L, top)
    val range = top + 1L
    // the clamp (not sqrt) must decide at this range, and the distinct
    // block count it admits stays within the 2^16 driver bound
    assert(bs > math.ceil(math.sqrt(range.toDouble)).toLong,
      s"bs=$bs: the byBound clamp must exceed sqrt at 2^40")
    assert((range - 1L) / bs + 2L <= PrepPipeline.PhaseTwoMaxBlocks)
    // end-to-end on a sparse corpus spanning the full range
    val docs = Seq((0L, "a b c"), (1L << 39, "d e"), (top, "f g h i"))
      .toDF("doc_id", "text")
    val out = PrepPipeline.packingOffsets(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((0L, 0L), (1L << 39, 3L), (top, 5L)),
      "global offsets must prefix-sum across sparse blocks")
    // plan shape: the prefix-sum window partitions by block — the
    // single-partition global window this operator exists to avoid
    // would print an empty partition spec
    val p = planString(PrepPipeline.packingOffsets(docs))
    assert(p.contains("windowspecdefinition(block#"),
      "phase-1 window must partition by block:\n" + p.take(2000))
  }

  test("basket pairs: a planted mega-order is pruned before the self-join") {
    // 200-item mega-basket (cap 15) + two small baskets
    val mega = (1L to 200L).map(p => (999L, p))
    val small = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L))
    val items = (mega ++ small).toDF("l_orderkey", "l_partkey")
    val out = OlapOps.basketPairs(items, topN = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the mega-order would contribute C(200,2)=19900 pairs; the cap
    // must keep only the small baskets' 3+1 pairs
    assert(out.length == 3, s"expected 3 distinct pairs, got ${out.length}")
    assert(out.toSeq == Seq((10L, 11L, 2L), (10L, 12L, 1L), (11L, 12L, 1L)),
      s"got ${out.toSeq}")
    // and no pair may mention a part only the mega-order carries
    assert(out.forall { case (p1, p2, _) => p1 <= 12L && p2 <= 12L })
  }

  test("HLL registers at 1M keys: output bounded by m, map-side combined") {
    import graft.operators.DistinctSketch
    val big = spark.range(1000000L)
      .select(lit("g").as("g"), col("id").as("k"))
    val df = DistinctSketch.registers(big, "g", "k")
    val p = planString(df)
    assert(p.contains("partial_max"),
      "register fold must combine map-side:\n" + p.take(2000))
    val rows = df.collect()
    // a million keys collapse to exactly m register rows (the bound
    // AND full occupancy), and 2^20 uniform hashes drive every rho up
    assert(rows.length == DistinctSketch.M)
    assert(rows.map(_.getLong(2)).min >= 10L,
      "1M uniform keys must drive every register's rho high")
  }

  test("AGMS grid at 200k keys: cells bounded by rows x width") {
    import graft.operators.JoinStrategies
    val counts = spark.range(200000L)
      .select(concat(lit("k"), col("id")).as("k"), lit(3L).as("cnt"))
    val cells = JoinStrategies.agmsCells(counts)
    val n = cells.count()
    // 200k keys fill but cannot exceed the d x w grid: exact equality
    // asserts the bound and full occupancy at once
    assert(n == JoinStrategies.AgmsRows * JoinStrategies.AgmsWidth,
      s"grid must stay d x w regardless of key count, got $n")
    // estimates remain metadata-scale: one row per sketch row
    assert(JoinStrategies.agmsEstimates(cells).count() ==
      JoinStrategies.AgmsRows)
  }
}
