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
}
