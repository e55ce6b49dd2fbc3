package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{ChangeCapture, OlapOps, Sessionize}

/** Specs for the round-5 reconciliation/analytics batch: snapshot
  * diff (CDC derive), unpivot, capped list-agg, group mode, rolling
  * distinct actives, and one-pass co-moments. Planted fixtures pin the
  * exact semantics; the driver's DuckDB oracle checks the same
  * operators on the shared testdata (q88-q93). */
class ReconAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops identical") {
    val vOld = Seq(
      (1L, "A", Some(100L)),   // removed
      (2L, "B", Some(200L)),   // identical -> dropped
      (3L, "C", Some(300L)),   // changed (cents)
      (4L, "D", None: Option[Long])) // changed (null -> value)
      .toDF("k", "status", "cents")
    val vNew = Seq(
      (2L, "B", Some(200L)),
      (3L, "C", Some(999L)),
      (4L, "D", Some(400L)),
      (5L, "E", Some(500L)))   // added
      .toDF("k", "status", "cents")
    val out = ChangeCapture.snapshotDiff(vOld, vNew, "k",
        Seq("status", "cents"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
  }

  test("snapshotDiff carries old/new values on change rows") {
    val vOld = Seq((1L, "X", Some(10L))).toDF("k", "status", "cents")
    val vNew = Seq((1L, "X", Some(11L))).toDF("k", "status", "cents")
    val r = ChangeCapture.snapshotDiff(vOld, vNew, "k",
      Seq("status", "cents")).collect().head
    assert(r.getAs[Long]("old_cents") == 10L &&
      r.getAs[Long]("new_cents") == 11L &&
      r.getAs[String]("old_status") == "X")
  }

  test("q91 registered diff matches the planted modulus design") {
    val out = ChangeCapture.snapshotDiffQuery(spark, sf0001)
    val byChange = out.groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every modulus class is non-empty at sf0.001 (1500 orders)
    assert(byChange.keySet == Set("added", "removed", "changed"))
    // a 'changed' row differs by exactly the planted +100 cents
    val ch = out.filter(col("change") === "changed").collect()
    assert(ch.nonEmpty && ch.forall(r =>
      r.getAs[Long]("new_cents") - r.getAs[Long]("old_cents") == 100L))
  }

  test("unpivot emits one row per (flag, measure) and preserves sums") {
    val out = OlapOps.unpivotQuery(spark, sf0001)
    val rows = out.collect()
    val measures = rows.map(_.getString(1)).distinct.sorted
    assert(measures.toSeq == Seq("l_discount", "l_extendedprice",
      "l_quantity", "l_tax"))
    // melt must not lose mass: per-measure total equals the direct sum
    val direct = graft.sources.Tables.lineitem(spark, sf0001)
      .agg((round(sum(col("l_quantity").cast("decimal(38,10)")), 2) * 100)
        .cast("long")).collect().head.getLong(0)
    val melted = rows.filter(_.getString(1) == "l_quantity")
      .map(_.getAs[Long]("total_cents")).sum
    assert(melted == direct)
  }

  test("unpivot plans a single Expand, no pre-agg shuffle") {
    val p = OlapOps.unpivotQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(p).size >= 1)
    // exactly one hash exchange (the final group-by) plus the sort for
    // orderBy; the melt itself must not exchange
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"melt must not shuffle, got $hashEx hash exchanges")
  }

  test("listAgg caps the roster but counts every member") {
    val suppliers = (1 to 40).map(i => (7, f"s_$i%03d")) :+ ((8, "zz"))
    val nation = Seq((7, "GONDOR"), (8, "ROHAN"))
      .toDF("n_nationkey", "n_name")
    val out = OlapOps.listAgg(
        suppliers.toDF("s_nationkey", "s_name"), nation, cap = 25)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2))).toMap
    val (n, roster) = out("GONDOR")
    assert(n == 40L, "count must cover members beyond the cap")
    val names = roster.split(",")
    assert(names.length == 25 && names.head == "s_001" &&
      names.last == "s_025" && (names.toSeq == names.toSeq.sorted))
    assert(out("ROHAN") == ((1L, "zz")))
  }

  test("listAgg window and groupBy share one exchange") {
    val p = OlapOps.listAggQuery(spark, sf0001)
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning\\(s_nationkey".r
      .findAllIn(p).size
    assert(hashEx == 1,
      s"cap-window + agg must share one s_nationkey exchange, got $hashEx")
  }

  test("groupMode picks the max count with alphabetic tie-break") {
    val customer = Seq((1L, "SEG"), (2L, "SEG")).toDF("c_custkey", "c_mktsegment")
    // priorities B and A tie at 2 orders each -> A wins
    val orders = Seq((10L, 1L, "B"), (11L, 1L, "B"), (12L, 2L, "A"),
      (13L, 2L, "A"), (14L, 2L, "C"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val r = OlapOps.groupMode(orders, customer).collect()
    assert(r.length == 1 && r.head.getString(1) == "A" &&
      r.head.getLong(2) == 2L)
  }

  test("rollingActive counts a user once per 7-day window, observed days only") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val ev = Seq(
      (1L, ts(1)), (1L, ts(1)),  // duplicate same-day events dedup
      (1L, ts(9)),               // outside day-1 window
      (2L, ts(3)))
      .toDF("user_id", "ts")
    val out = Sessionize.rollingActive(ev, windowDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // observed days: 1, 3, 9. day1: {u1}; day3: {u1(d1), u2(d3)};
    // day9: {u1(d9), u2(d3: 3+6=9 >= 9)}
    assert(out == Map("2024-01-01" -> 1L, "2024-01-03" -> 2L,
      "2024-01-09" -> 2L))
  }

  test("comoments sums are exact on planted integers") {
    val out = OlapOps.comomentsQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    // spot-identity on the real table: n*sum_qq >= sum_q^2 (Cauchy-
    // Schwarz with equality only for constant q) for every flag
    out.foreach { r =>
      val (n, sq, sqq) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(n * sqq >= sq * sq)
    }
    // exact planted check: q=[2,3], d=[10,20] for one flag
    val planted = Seq(("A", 2.0, 10.0), ("A", 3.0, 20.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .withColumn("l_partkey", lit(1L))
    val q = round(col("l_quantity").cast("decimal(38,10)"), 0).cast("long")
    val d = round(col("l_extendedprice").cast("decimal(38,10)"), 0).cast("long")
    val s = planted.select(col("l_returnflag"), q.as("q"), d.as("d"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"),
        sum(col("d")).as("sum_d"),
        sum(col("q") * col("q")).as("sum_qq"),
        sum(col("q") * col("d")).as("sum_qd"),
        sum(col("d") * col("d")).as("sum_dd"))
      .collect().head
    assert((s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4),
      s.getLong(5), s.getLong(6)) == ((2L, 5L, 30L, 13L, 80L, 500L)))
  }

  test("histogram zero-fills interior empty bins") {
    val vals = Seq(5L, 15L, 45L).toDF("cents") // bins 0, 1, 4 at w=10
    val out = OlapOps.histogram(vals, widthCents = 10L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L), "spine must be contiguous")
    assert(out(2L) == ((20L, 29L, 0L)) && out(3L) == ((30L, 39L, 0L)))
    assert(out(0L) == ((0L, 9L, 1L)) && out(4L) == ((40L, 49L, 1L)))
  }

  test("histogram mass equals input rows on testdata") {
    val out = OlapOps.histogramQuery(spark, sf0001)
    val total = out.agg(sum("n_orders")).collect().head.getLong(0)
    val orders = graft.sources.Tables.orders(spark, sf0001).count()
    assert(total == orders)
  }

  test("bpePairs weights pairs by corpus word frequency") {
    import graft.operators.TextAnalysis
    // "ab" appears twice, "abc" once: pair ab = 2 + 1, bc = 1;
    // "Zz!" fails the ascii-word gate, "x" fails the length gate
    val docs = Seq("ab ab abc", "Zz! x").toDF("text")
    val out = TextAnalysis.bpePairs(docs, topN = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("ab" -> 3L, "bc" -> 1L))
  }

  test("driftUnion null-fills exactly the columns each version lacks") {
    val out = graft.operators.ChangeCapture.driftUnionQuery(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ver, n, legacy, value, channel) = (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      if (ver == "v1") assert(value == 0L && channel == 0L && legacy <= n)
      else assert(legacy == 0L && channel == n && value <= n)
    }
  }

  test("madOutliers fences are consistent on testdata") {
    val out = OlapOps.madOutliersQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mad, outliers) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(mad >= 0L && outliers >= 0L && outliers < n,
        "a majority of points can never sit beyond 3 MAD")
    }
  }
}
