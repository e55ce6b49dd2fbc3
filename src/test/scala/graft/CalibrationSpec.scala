package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, OlapOps}

/** Specs for the round-5 calibration/apportionment batch: distributed
  * global rank, quantile mapping, weighted sampling, largest-remainder
  * budget allocation, and chi-square components (q102-q105). */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("globalRankAsc equals a single-window rank across blocks") {
    // values straddle several 10-cent blocks, with a tie
    val vals = Seq((1L, 95L), (2L, 5L), (3L, 25L), (4L, 25L), (5L, 7L))
      .toDF("id", "cents")
    val out = OlapOps.globalRankAsc(vals, blockWidth = 10L)
      .select("id", "rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sorted by (cents, id): 2(5), 5(7), 3(25), 4(25), 1(95)
    assert(out == Map(2L -> 1L, 5L -> 2L, 3L -> 3L, 4L -> 4L, 1L -> 5L))
    val n = OlapOps.globalRankAsc(vals, 10L).select("n_total")
      .distinct().collect()
    assert(n.length == 1 && n.head.getLong(0) == 5L)
  }

  test("quantileMap sends distribution extremes to extremes") {
    val out = OlapOps.quantileMapQuery(spark, sf0001).collect()
    val byBal = out.sortBy(_.getLong(1))
    val supMin = graft.sources.Tables.supplier(spark, sf0001)
      .agg((round(min(col("s_acctbal").cast("decimal(38,10)")), 2) * 100)
        .cast("long"),
        (round(max(col("s_acctbal").cast("decimal(38,10)")), 2) * 100)
          .cast("long")).collect().head
    assert(byBal.head.getLong(2) == supMin.getLong(0),
      "lowest customer must calibrate to the lowest supplier balance")
    assert(byBal.last.getLong(2) == supMin.getLong(1),
      "highest customer must calibrate to the highest supplier balance")
    // calibrated values are monotone in the source balance
    val calib = byBal.map(_.getLong(2))
    assert(calib.zip(calib.tail).forall { case (a, b) => a <= b })
  }

  test("budgetAlloc is exactly exhaustive with largest-remainder seats") {
    // equal masses, budget 10: floors 3+3+3, one seat to the
    // alphabetically-first of the tied remainders
    val mass = Seq(("aa", 5L), ("bb", 5L), ("cc", 5L)).toDF("lang", "mass")
    val out = OlapOps.budgetAlloc(mass, budget = 10L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("aa" -> 4L, "bb" -> 3L, "cc" -> 3L))
    // and on testdata the allocations sum to the budget exactly
    val total = OlapOps.budgetAllocQuery(spark, sf0001)
      .agg(sum("alloc_tokens")).collect().head.getLong(0)
    assert(total == OlapOps.BudgetTokens)
  }

  test("chiSquare residual numerators cancel within every row margin") {
    val rows = OlapOps.chiSquareQuery(spark, sf0001).collect()
    assert(rows.length == 25)
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(6)).sum == 0L,
        "sum over a contingency row of obs*n - rowTot*colTot must be 0")
    }
    // margins are consistent: row totals sum to n
    val n = rows.head.getLong(5)
    assert(rows.map(r => (r.getString(0), r.getLong(3))).distinct
      .map(_._2).sum == n)
  }

  test("weightedSample is deterministic and favors no absent doc") {
    val a = Curation.weightedSample(
      graft.sources.Tables.documents(spark, sf0001))
    val b = Curation.weightedSample(
      graft.sources.Tables.documents(spark, sf0001))
    assert(a.collect().sameElements(b.collect()))
    assert(a.count() == 50)
  }

  test("trend slope components recover a planted linear signal") {
    // one type, days 0..3 with y = 2x+1 events -> slope exactly 2
    val base = 1704067200000L // 2024-01-01T00:00:00Z
    val rows = (0 until 4).flatMap { d =>
      (0 until 2 * d + 1).map { i =>
        (d * 10L + i, (base + d * 86400000L) * 1000000L, 1L, "click",
          0.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("trend_fix")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = OlapOps.trendQuery(spark, dir).collect().head
    val (num, den) = (r.getLong(6), r.getLong(7))
    assert(den != 0 && num == 2 * den, s"slope must be exactly 2: $num/$den")
  }

  test("frequency spectrum mass identity: sum of k*N_k is the token count") {
    val out = OlapOps.freqSpectrumQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    val ks = out.map(_.getLong(0))
    assert(ks.zip(ks.tail).forall { case (a, b) => a < b })
    assert(out.forall(_.getLong(1) > 0))
    // the synthetic corpus's full spectrum fits under the cap, so the
    // Good-Turing identity Σ k·N_k == |tokens| must hold exactly
    val mass = out.map(r => r.getLong(0) * r.getLong(1)).sum
    val tokens = graft.sources.Tables.documents(spark, sf0001)
      .select(size(graft.functions.TextFunctions.tokens(col("text")))
        .cast("long").as("n")).agg(sum("n")).collect().head.getLong(0)
    assert(mass == tokens, s"spectrum mass $mass != token count $tokens")
  }

  test("k-anonymity flags exactly the sub-threshold classes") {
    val flagged = OlapOps.kAnonymityQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val direct = graft.sources.Tables.customer(spark, sf0001)
      .groupBy("c_mktsegment", "c_nationkey").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(flagged == direct.filter(_._2 < OlapOps.AnonK))
  }

  test("gini: zero on equal revenues, near-one on a degenerate one") {
    // uniform distribution -> G = 0 exactly
    val eq = (1L to 10L).map(i => (i, 500L)).toDF("id", "cents")
    val g0 = OlapOps.globalRankAsc(eq, 100L)
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        expr("sum(CAST(rn AS DECIMAL(38,0)) * cents)").as("w"))
      .select(expr("CAST((2*w - (n+1)*s) * 1000000 div (n*s) AS BIGINT)"))
      .collect().head.getLong(0)
    assert(g0 == 0L)
    // one customer owns everything: G -> (n-1)/n = 0.9
    val deg = ((1L to 9L).map(i => (i, 0L)) :+ (10L, 9000L))
      .toDF("id", "cents")
    val g1 = OlapOps.globalRankAsc(deg, 100L)
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        expr("sum(CAST(rn AS DECIMAL(38,0)) * cents)").as("w"))
      .select(expr("CAST((2*w - (n+1)*s) * 1000000 div (n*s) AS BIGINT)"))
      .collect().head.getLong(0)
    assert(g1 == 900000L, s"degenerate gini $g1")
    // the registered query's value sits strictly between
    val r = OlapOps.giniQuery(spark, sf0001).collect().head
    assert(r.getLong(2) > 0L && r.getLong(2) < 1000000L)
  }

  test("l-diversity and t-closeness audit the same class grid coherently") {
    val lRows = OlapOps.lDiversityQuery(spark, sf0001).collect()
    for (r <- lRows) {
      val (size, l) = (r.getLong(2), r.getLong(3))
      assert(l < OlapOps.AnonL && l >= 1 && size >= l,
        s"flagged class must be uniform-ish: size=$size l=$l")
    }
    val tRows = OlapOps.tClosenessQuery(spark, sf0001).collect()
    // the t-closeness table covers EVERY class once
    val classes = graft.sources.Tables.customer(spark, sf0001)
      .select("c_mktsegment", "c_nationkey").distinct().count()
    assert(tRows.length == classes)
    // TVD is a metric on [0, 1] -> e6 integer in [0, 1e6]; singleton
    // classes concentrate all mass in one band, so their TVD must be
    // strictly positive (global distribution spreads over >= 2 bands)
    for (r <- tRows) {
      val tvd = r.getLong(3)
      assert(tvd >= 0L && tvd <= 1000000L)
      if (r.getLong(2) == 1L) assert(tvd > 0L,
        "a singleton class cannot match a multi-band global distribution")
    }
  }

  test("weighted median follows the token mass, not the doc count") {
    // lang X: a 10-char 1-token doc and a 20-char 9-token doc; half
    // the mass sits at 20 chars, so the weighted median is 20 (the
    // count median would average the two)
    val docs = Seq(
      (1L, "a", "X", 10L),
      (2L, Seq.fill(9)("w").mkString(" "), "X", 20L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val dir = tmpDir("wmed_fix")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = OlapOps.weightedMedianQuery(spark, dir).collect().head
    assert(r.getString(0) == "X" && r.getLong(1) == 10L &&
      r.getLong(2) == 20L, s"got $r")
  }

  test("basket pairs count co-orders and prune oversized baskets") {
    val rows = Seq(1L -> Seq(1L, 2L, 3L), 2L -> Seq(1L, 2L),
      3L -> (1L to 16L)) // basket 3 exceeds the cap -> pruned
      .flatMap { case (o, ps) => ps.map(p => (o, p)) }
      .toDF("l_orderkey", "l_partkey")
    val dir = tmpDir("basket_fix")
    rows.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = OlapOps.basketPairsQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L),
      s"got $out")
  }

  test("contiguity audit matches a direct recompute (violations are real)") {
    // the synthetic lineitem assigns random, duplicated line numbers,
    // so most orders genuinely violate 1..n contiguity — the audit
    // must agree with an independent spelling of the rule
    val r = OlapOps.contiguityQuery(spark, sf0001).collect().head
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val direct = li.groupBy("l_orderkey")
      .agg(collect_list(col("l_linenumber")).as("ls"))
      .collect().map { row =>
        val ls = row.getSeq[Int](1).sorted
        if (ls == (1 to ls.length).toList) 0L else 1L
      }
    assert(r.getLong(0) == direct.length && r.getLong(1) == direct.sum,
      s"got $r expected (${direct.length}, ${direct.sum})")
    // and a contiguous planted basket passes
    val ok = Seq((1L, 1), (1L, 2), (1L, 3)).toDF("l_orderkey", "l_linenumber")
    val dir = tmpDir("contig_fix")
    ok.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val clean = OlapOps.contiguityQuery(spark, dir).collect().head
    assert(clean.getLong(0) == 1L && clean.getLong(1) == 0L)
  }

  test("stratified exact-K takes K per language, deterministically") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val out = Curation.stratifiedExactK(docs).collect()
    val perLang = out.groupBy(_.getString(1)).view.mapValues(_.length)
    perLang.foreach { case (lang, n) =>
      assert(n == Curation.StratumK, s"$lang got $n") }
    assert(out.map(_.getLong(2)).forall(rn =>
      rn >= 1 && rn <= Curation.StratumK))
    val again = Curation.stratifiedExactK(docs).collect()
    assert(out.sameElements(again))
  }

  test("drift TVD shares floor-sum to 1e6 and halves cover the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val rows = Curation.driftTvdQuery(docs).collect()
    val (sa, sb) = (rows.map(_.getLong(3)).sum, rows.map(_.getLong(4)).sum)
    assert(sa <= 1000000L && sa > 1000000L - rows.length)
    assert(sb <= 1000000L && sb > 1000000L - rows.length)
    val mass = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(mass == docs.count())
  }

  test("pareto classes partition the parts and conserve revenue") {
    val rows = OlapOps.paretoQuery(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("A", "B", "C"))
      && rows.map(_.getString(0)).contains("A"))
    val totalRev = graft.sources.Tables.lineitem(spark, sf0001)
      .agg((round(sum(col("l_extendedprice").cast("decimal(38,10)")), 2)
        * 100).cast("long")).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalRev,
      "class revenue must conserve the corpus total")
    val nParts = graft.sources.Tables.lineitem(spark, sf0001)
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nParts)
  }

  test("heatmap covers the full 7x24 grid and conserves event mass") {
    val rows = OlapOps.heatmapQuery(spark, sf0001).collect()
    assert(rows.length == 168)
    val mass = rows.map(_.getLong(2)).sum
    assert(mass == graft.sources.Tables.events(spark, sf0001).count())
    // Jan 2024 starts on a Monday; dow 1 must carry events at sf0.001
    assert(rows.filter(_.getLong(0) == 1L).map(_.getLong(2)).sum > 0)
  }

  test("bounce rate is bounded and counts every session") {
    import graft.operators.Sessionize
    val rows = Sessionize.bounceRateQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
    val sessions = Sessionize.sessionQuery(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == sessions)
  }

  test("source vocab overlap: jaccard bounded, pairs at most C(n,2)") {
    import graft.operators.CorpusStats
    val rows = CorpusStats.sourceVocabOverlapQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.documents(spark, sf0001)
      .select("source").distinct().count()
    assert(rows.length <= n * (n - 1) / 2)
    rows.foreach(r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L))
  }

  test("autocorrelation sums obey Cauchy-Schwarz per type") {
    val rows = OlapOps.autocorrQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tp, tt, pp) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(tp * tp <= tt * pp)
    }
  }

  test("assertion suite shares one scan and the clean rules hold") {
    val rows = graft.quality.DataQuality
      .assertionSuiteQuery(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == graft.quality.DataQuality.AssertionRules.size)
    val n = rows.values.head._1
    rows.values.foreach { case (rn, v) =>
      assert(rn == n && v >= 0 && v <= n) }
    assert(rows("known_event_type")._2 == 0L)
    assert(rows("ts_in_2024")._2 == 0L)
    assert(rows("user_id_nonnegative")._2 == 0L)
  }

  test("RFM cells cover every customer with scores in 1..3") {
    val rows = OlapOps.rfmQuery(spark, sf0001).collect()
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(s =>
        assert(s >= 1 && s <= 3))
    }
    val customers = graft.sources.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == customers)
  }

  test("HHI is bounded by 1e12 and restricted to multi-supplier parts") {
    val rows = OlapOps.hhiQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2L)
      assert(r.getLong(2) > 0L && r.getLong(2) <= 1000000000000L)
    }
  }

  test("seasonal residuals are ordered by magnitude; norms consistent") {
    val rows = OlapOps.seasonalResidualQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val mags = rows.map(r => math.abs(r.getLong(4)))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getLong(5) >= 1L))
  }

  test("new vs returning decomposes daily actives; day one is all new") {
    val rows = OlapOps.newVsReturningQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(2) == 0L,
      "the first observed day can have no returning users")
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val userDays = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(total == userDays)
    val newSum = rows.map(_.getLong(1)).sum
    val users = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(newSum == users, "each user is new exactly once")
  }

  test("ivm partial-merge equals the direct full recompute") {
    val merged = OlapOps.ivmQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val direct = graft.sources.Tables.orders(spark, sf0001)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("o_totalprice").cast("decimal(38,10)")), 2) * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(merged == direct)
  }

  test("weighted quantiles: probes are monotone and the 50th " +
    "reproduces the q119 weighted median exactly") {
    val wq = OlapOps.weightedQuantilesQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val med = OlapOps.weightedMedianQuery(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val langs = wq.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val series = OlapOps.WeightedProbes.map(p => wq((l, p))._2)
      assert(series == series.sorted, s"$l quantiles must be monotone")
      assert(wq((l, 50))._2 == med(l),
        s"$l: 50th weighted quantile must equal the weighted median")
    }
  }

  test("winsorized mean: bounds are corpus values, the mean sits " +
    "inside them, and clamping never raises the max") {
    val out = OlapOps.winsorizedMeanQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi) = (r.getLong(2), r.getLong(3))
      val mean = r.getLong(5)
      assert(lo <= hi)
      assert(mean >= lo && mean <= hi,
        s"${r.getString(0)}: winsorized mean must lie within the bounds")
    }
  }

  test("ivm with retractions equals the post-delete recompute, " +
    "and deletes genuinely retract mass") {
    val maintained = OlapOps.ivmRetractQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val rowCents = expr(
      "CAST(round(CAST(o_totalprice AS DECIMAL(38,10)), 2) * 100 AS BIGINT)")
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"), col("o_orderkey"), rowCents.as("cents"))
    val live = orders.filter(
      !(col("month") < lit(OlapOps.IvmCutover.substring(0, 7)) &&
        pmod(col("o_orderkey"), lit(OlapOps.IvmDeleteMod)) === 0))
    val direct = live.groupBy("month", "o_orderstatus")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("cents")).cast("long").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(maintained == direct)
    // the retracted slice is non-empty at sf0.001, so the maintained
    // view must differ from the no-deletes view somewhere
    val noDeletes = OlapOps.ivmQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(maintained != noDeletes)
  }

  test("benford audit: exact digit counts, complete reference, e6 shares") {
    import spark.implicits._
    // 10 amounts: digits 1,1,1,1,2,2,3,9 and two more 1s via 4-digit
    // cents — leading digit comes from the cents STRING, so 1099 -> 1
    val cents = Seq(100L, 150L, 1099L, 1999L, 12L, 25L, 299L, 31L,
      9000L, 18L)
    val out = graft.quality.DataQuality.benford(cents.toDF("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    // all nine reference digits present even when unobserved
    assert(out.map(_._1) == (1 to 9).toList)
    val byDigit = out.map(r => r._1 -> r).toMap
    // digits: 100,150,1099,1999,12,18 -> 1 (x6); 25,299 -> 2 (x2);
    // 31 -> 3; 9000 -> 9
    assert(byDigit(1)._2 == 6L && byDigit(2)._2 == 2L &&
      byDigit(3)._2 == 1L && byDigit(9)._2 == 1L)
    assert(byDigit(4)._2 == 0L && byDigit(4)._3 == 0L)
    // shares are exact floors of n/10
    assert(byDigit(1)._3 == 600000L && byDigit(2)._3 == 200000L)
    // deviation column is |share - benford| on the same scale
    assert(byDigit(1)._5 == math.abs(600000L - 301029L))
    // observed shares sum to ~1e6 (floor loss < 9)
    val sumShares = out.map(_._3).sum
    assert(sumShares > 999990L && sumShares <= 1000000L)
  }
}
