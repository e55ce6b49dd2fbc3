package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinStrategies
import graft.sources.Tables

class JoinStrategiesSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the naive theta join, bounds inclusive") {
    val points = Seq(
      (1L, 100L, 0L), (1L, 101L, 999L), (1L, 102L, 1000L), (1L, 103L, 2500L),
      (2L, 200L, 500L))
      .toDF("k", "pid", "t")
    // interval (1, 10, [1000, 2600]) crosses a 1000-wide bucket border
    val intervals = Seq(
      (1L, 10L, 1000L, 2600L), (1L, 11L, 0L, 999L), (2L, 20L, 2000L, 3000L))
      .toDF("k", "iid", "s", "e")
    val fast = JoinStrategies.rangeJoin(points, intervals, "k", "t", "s", "e",
      bucketWidth = 1000L)
      .select("k", "pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"t" >= $"s" && $"t" <= $"e")
      .select("k", "pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == naive)
    assert(fast == Set((1L, 100L, 11L), (1L, 101L, 11L), // end inclusive
      (1L, 102L, 10L), (1L, 103L, 10L)))                 // start inclusive
  }

  test("as-of join: backward inclusive, null before first build row") {
    val probe = Seq(
      (1L, 10L, 100L), (1L, 11L, 200L), (1L, 12L, 250L), (1L, 13L, 400L),
      (2L, 20L, 150L)) // user 2 has no purchases at all
      .toDF("user_id", "event_id", "t")
    val build = Seq(
      (1L, 200L, 5.0), // exactly at probe 11's time -> inclusive match
      (1L, 300L, 7.0)) // between probes 12 and 13
      .toDF("user_id", "t", "v")
    val out = graft.operators.AsOfJoin
      .asOfJoin(probe, build, "user_id", "t", Seq("v", "t"))
      .orderBy("event_id")
      .collect()
      .map(r => r.getLong(1) ->
        (Option(r.get(r.fieldIndex("asof_v"))),
          Option(r.get(r.fieldIndex("asof_t")))))
      .toMap
    assert(out(10L) == (None, None))            // before any build row
    assert(out(11L) == (Some(5.0), Some(200L))) // tie is inclusive
    assert(out(12L) == (Some(5.0), Some(200L)))
    assert(out(13L) == (Some(7.0), Some(300L))) // picks the LATEST <=
    assert(out(20L) == (None, None))            // key with no build rows
  }

  test("as-of join: null attach values travel with their matched row") {
    val probe = Seq((1L, 10L, 250L), (1L, 11L, 350L))
      .toDF("user_id", "event_id", "t")
    val build = Seq(
      (1L, 200L, Some(5.0), Some("a")),
      (1L, 300L, None, Some("b"))) // newer row has a NULL v
      .toDF("user_id", "t", "v", "tag")
    val out = graft.operators.AsOfJoin
      .asOfJoin(probe, build, "user_id", "t", Seq("v", "tag"))
      .orderBy("event_id")
      .collect()
      .map(r => r.getLong(1) ->
        (Option(r.get(r.fieldIndex("asof_v"))),
          Option(r.get(r.fieldIndex("asof_tag")))))
      .toMap
    assert(out(10L) == (Some(5.0), Some("a")))
    // DuckDB ASOF semantics: the matched row (t=300) attaches its own
    // null v — v must NOT fall back to the older row's 5.0.
    assert(out(11L) == (None, Some("b")))
  }

  test("bucketed join on matching bucketing elides the shuffle") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val or = Tables.orders(spark, sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    JoinStrategies.writeBucketed(li, "li_b", "l_orderkey", 8)
    JoinStrategies.writeBucketed(or, "or_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = JoinStrategies.bucketedJoin(spark, "li_b", "or_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan)
      assert(joined.count() == li.count()) // FK integrity: every item joins
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
    }
  }

  test("q240 round-trip: bucketed join aggregate equals the plain-" +
    "parquet aggregate, and the join plans with no join-key exchange") {
    try {
      val got = JoinStrategies.bucketedRevenueQuery(spark, sf0001)
        .collect().toSeq
      val want = Tables.orders(spark, sf0001)
        .join(Tables.lineitem(spark, sf0001),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"),
          (round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,10)")), 2) * 100).cast("long")
            .as("revenue_cents"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(got == want)
      // the join sub-plan over the bucketed tables: no shuffle on
      // either join key (the groupBy's 5-row exchange is the only one
      // allowed in the full query)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val p = JoinStrategies.bucketedRevenue(spark)
          .queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin"), p)
        assert(!p.contains("Exchange hashpartitioning(o_orderkey") &&
          !p.contains("Exchange hashpartitioning(l_orderkey"),
          "bucketed layout must elide the join shuffle:\n" + p)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_q240_orders")
      spark.sql("DROP TABLE IF EXISTS graft_q240_lineitem")
    }
  }

  test("salted join equals plain join and spreads hot keys") {
    val li = Tables.lineitem(spark, sf0001)
    val or = Tables.orders(spark, sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(or, "l_orderkey")
      .agg(count(lit(1)), sum(col("l_quantity")).cast("decimal(38,10)"))
      .collect().head
    val salted = JoinStrategies.saltedEquiJoin(li, or, "l_orderkey", 7)
      .agg(count(lit(1)), sum(col("l_quantity")).cast("decimal(38,10)"))
      .collect().head
    assert(plain == salted)
  }

  test("derived salt factor: 1 on uniform keys, >1 on a planted hot key") {
    import spark.implicits._
    // uniform: 1000 rows over 100 keys — hottest ≈ mean, no salting
    val uniform = (0L until 1000L).map(i => (i % 100L, i)).toDF("k", "v")
    assert(JoinStrategies.deriveSaltFactor(uniform, "k") == 1)
    // planted hot key: one key owns half the table (ratio >> 4x mean)
    val hot = ((0L until 5000L).map(_ => (0L, 0L)) ++
      (0L until 5000L).map(i => (1L + i % 99L, i))).toDF("k", "v")
    val f = JoinStrategies.deriveSaltFactor(hot, "k")
    assert(f > 1, s"hot key must trigger salting, got $f")
    assert(f <= 64, s"factor must respect the cap, got $f")
    // an empty or fully-filtered fact table has no skew to measure
    assert(JoinStrategies.deriveSaltFactor(
      uniform.filter(col("k") < 0), "k") == 1)
    // the auto-salted join still equals the plain join on skewed data
    val dim = (0L until 100L).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = hot.join(dim, "k").agg(count(lit(1)), sum("v"))
      .collect().head
    val auto = JoinStrategies.saltedEquiJoinAuto(hot, dim, "k")
      .agg(count(lit(1)), sum("v")).collect().head
    assert(plain == auto)
  }

  test("bloom prune report: no false negatives, FP rate consistent") {
    val r = JoinStrategies.bloomPruneQuery(spark, sf0001).collect()
    assert(r.length == 1)
    val row = r.head
    val Seq(nKeys, nBits, nFact, nPass, nTrue, nFp, fpE6) =
      (0 until 7).map(row.getLong)
    // geometry: set bits bounded by hashes x keys and by the grid
    assert(nBits > 0 && nBits <= math.min(
      JoinStrategies.BloomHashes.toLong * nKeys,
      JoinStrategies.BloomBits.toLong))
    // the defining Bloom property: every true match passes the filter
    assert(nPass >= nTrue, "a Bloom filter admits no false negatives")
    assert(nFp == nPass - nTrue)
    assert(fpE6 == nFp * 1000000L / math.max(nFact - nTrue, 1L))
    // the exact semi-join the filter approximates agrees with n_true
    val expect = graft.sources.Tables.orders(spark, sf0001)
      .join(graft.sources.Tables.customer(spark, sf0001)
          .filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_semi")
      .count()
    assert(nTrue == expect)
  }

  test("AGMS self-join size: accurate on a planted zipf, merges by sum") {
    import spark.implicits._
    // counts 1..50 -> F2 = sum i^2 = 42925
    val counts = (1L to 50L).map(i => (s"k$i", i)).toDF("k", "cnt")
    val exact = (1L to 50L).map(i => i * i).sum
    val ests = JoinStrategies.agmsEstimates(JoinStrategies.agmsCells(counts))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ests.size == JoinStrategies.AgmsRows)
    val median = ests.values.toSeq.sorted.apply(ests.size / 2)
    assert(math.abs(median - exact).toDouble / exact < 0.3,
      s"median $median vs exact $exact")
    // mergeability: cell grids of two disjoint slices sum into the
    // whole-corpus grid (what a streaming per-batch partial relies on)
    val (a, b) = ((1L to 25L).map(i => (s"k$i", i)).toDF("k", "cnt"),
      (26L to 50L).map(i => (s"k$i", i)).toDF("k", "cnt"))
    def cellMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cellMap(JoinStrategies.agmsCells(counts))
    val merged = (cellMap(JoinStrategies.agmsCells(a)).toSeq ++
      cellMap(JoinStrategies.agmsCells(b)).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == whole,
      "slice grids must sum cell-wise into the corpus grid")
  }

  test("AGMS inner product estimates a two-relation join size") {
    import spark.implicits._
    // overlap k11..k20: exact |A join B| = sum_{11..20} i * 2i = 4570
    val a = (1L to 20L).map(i => (s"k$i", i)).toDF("k", "cnt")
    val b = (11L to 30L).map(i => (s"k$i", 2L * i)).toDF("k", "cnt")
    val exact = (11L to 20L).map(i => i * 2L * i).sum
    val ests = JoinStrategies.agmsCells(a).withColumnRenamed("c", "ca")
      .join(JoinStrategies.agmsCells(b).withColumnRenamed("c", "cb"),
        Seq("r", "bucket"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("est"))
      .collect().map(r => r.getLong(1)).sorted
    val median = ests(ests.length / 2)
    // sparse planted keys rarely collide at width 1024, so every
    // row's estimate should be close; assert the median tightly
    assert(math.abs(median - exact).toDouble / exact < 0.3,
      s"median $median vs exact $exact (ests ${ests.mkString(",")})")
  }
}
