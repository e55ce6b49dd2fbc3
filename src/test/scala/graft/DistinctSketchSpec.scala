package graft

import graft.operators.DistinctSketch

/** HLL register sketch (q152): register construction, mergeability,
  * and the derived estimate's accuracy against the exact counts the
  * query carries alongside. */
class DistinctSketchSpec extends SparkSpec {

  private lazy val rows =
    DistinctSketch.hllRegistersQuery(spark, sf0001).collect()

  test("register grid is well-formed: indices and rhos in range") {
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (reg, rho) = (r.getLong(1), r.getLong(2))
      assert(reg >= 0 && reg < DistinctSketch.M, s"register $reg")
      assert(rho >= 1 && rho <= DistinctSketch.RhoCap, s"rho $rho")
    }
    // exact count is constant within a group
    for ((_, g) <- rows.groupBy(_.getString(0)))
      assert(g.map(_.getLong(3)).distinct.length == 1)
  }

  test("__all__ registers are the elementwise max of the type registers") {
    val byType = rows.filter(_.getString(0) != "__all__")
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).max).toMap
    val merged = rows.filter(_.getString(0) == "__all__")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(merged == byType,
      "merge-by-max over type registers must equal the global registers")
  }

  test("HLL estimate lands within the p=4 error budget of exact") {
    // 1.04/sqrt(16) = 26% standard error; 2 sigma with slack for the
    // small register count — the point is order-of-magnitude sanity,
    // the registers themselves are hash-checked by the oracle
    for ((grp, g) <- rows.groupBy(_.getString(0))) {
      val regs = g.map(r => r.getLong(1) -> r.getLong(2)).toMap
      val exact = g.head.getLong(3).toDouble
      val est = DistinctSketch.estimate(regs)
      assert(math.abs(est - exact) / exact < 0.6,
        s"$grp: estimate $est vs exact $exact")
    }
  }

  test("register algebra: union by max, intersection by inclusion-exclusion") {
    import spark.implicits._
    // planted overlap: A = 0..999, B = 500..1499, |A∩B| = 500
    def regsOf(lo: Long, hi: Long) = DistinctSketch.registers(
      (lo until hi).map(k => ("g", k)).toDF("g", "k"), "g", "k")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val (ra, rb) = (regsOf(0L, 1000L), regsOf(500L, 1500L))
    val ru = (0 until DistinctSketch.M).map(_.toLong)
      .map(j => j -> math.max(ra.getOrElse(j, 0L), rb.getOrElse(j, 0L)))
      .toMap
    val (ea, eb, eu) = (DistinctSketch.estimate(ra),
      DistinctSketch.estimate(rb), DistinctSketch.estimate(ru))
    // union of registers estimates the set union, and is monotone
    assert(eu >= math.max(ea, eb))
    assert(math.abs(eu - 1500.0) / 1500.0 < 0.5, s"union est $eu")
    // inclusion-exclusion intersection: rough at p = 4 (errors of all
    // three estimates stack) but the right order of magnitude — the
    // production answer is a bigger p, not a different algebra
    val ei = ea + eb - eu
    assert(ei > 0.0 && ei <= 2.0 * 500.0, s"intersection est $ei")
  }

  test("daily register table serves the week window by partial merge") {
    val rows = DistinctSketch.dailyRegistersQuery(spark, sf0001).collect()
    val days = rows.map(_.getString(0)).distinct.filter(_ != "__week1__")
      .sorted
    assert(days.nonEmpty && rows.exists(_.getString(0) == "__week1__"))
    // the window rows must equal the max-merge of the first week's
    // daily rows (recomputed here driver-side from the same output)
    val weekDays = days.filter(_ <= java.time.LocalDate.parse(days.head)
      .plusDays(6).toString).toSet
    val manual = rows.filter(r => weekDays(r.getString(0)))
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).max).toMap
    val window = rows.filter(_.getString(0) == "__week1__")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(window == manual,
      "window registers must be the max-merge of the daily partials")
    // window exact distinct >= any single day's
    val dayExact = rows.filter(r => weekDays(r.getString(0)))
      .map(_.getLong(3)).max
    val winExact = rows.filter(_.getString(0) == "__week1__")
      .head.getLong(3)
    assert(winExact >= dayExact)
  }

  test("sliding registers: every day's window is the max-merge of its " +
    "trailing daily partials, and exact counts are monotone vs days") {
    import org.apache.spark.sql.functions._
    val rows = DistinctSketch.slidingRegistersQuery(spark, sf0001)
      .collect()
    val daily = DistinctSketch.registers(
      graft.sources.Tables.events(spark, sf0001)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
          col("user_id")), "d", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val days = daily.keys.map(_._1).toSeq.distinct.sorted
    // recompute each window's registers driver-side from the dailies
    rows.groupBy(_.getString(0)).foreach { case (wd, wrows) =>
      val winDays = days.filter(d =>
        d <= wd && java.time.LocalDate.parse(d)
          .plusDays(DistinctSketch.SlideDays - 1).toString >= wd)
      val manual = daily.collect {
        case ((d, reg), rho) if winDays.contains(d) => reg -> rho
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val got = wrows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == manual, s"window $wd register mismatch")
      // the trailing-window exact distinct can never be below the
      // window-ending day's own daily distinct
      assert(wrows.head.getLong(3) >= 1L)
    }
    assert(rows.map(_.getString(0)).distinct.length == days.length)
  }

  test("sliding windows served from per-batch maintained dailies " +
    "equal the batch serve (maintenance commutes with the window)") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
        col("user_id"), col("event_id"))
    // two ingest batches arriving separately; maintenance max-merges
    // their daily partials (the foreachBatch upsert rule)
    def daily(df: org.apache.spark.sql.DataFrame) =
      DistinctSketch.registers(df.select("d", "user_id"), "d", "user_id")
    val maintained = daily(ev.filter(col("event_id") % 2 === 0))
      .unionByName(daily(ev.filter(col("event_id") % 2 =!= 0)))
      .groupBy("d", "register").agg(max(col("max_rho")).as("max_rho"))
    def winMap(dailyDf: org.apache.spark.sql.DataFrame) =
      DistinctSketch.slidingFromDaily(dailyDf).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(winMap(maintained) == winMap(daily(ev)),
      "partial maintenance must be invisible to the window serve")
  }

  test("fast-hash config keeps shape, merge property, and accuracy") {
    import spark.implicits._
    val keys = (0L until 800L).map(k => ("g", k)).toDF("g", "k")
    val regs = DistinctSketch.registers(keys, "g", "k", portable = false)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    for ((reg, rho) <- regs) {
      assert(reg >= 0 && reg < DistinctSketch.M)
      assert(rho >= 1 && rho <= DistinctSketch.RhoCap)
    }
    val est = DistinctSketch.estimate(regs)
    assert(math.abs(est - 800.0) / 800.0 < 0.6, s"fast estimate $est")
    // merge property holds under either hash family
    val (a, b) = ((0L until 400L), (400L until 800L))
    def rOf(ks: Seq[Long]) = DistinctSketch.registers(
      ks.map(k => ("g", k)).toDF("g", "k"), "g", "k", portable = false)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = (rOf(a).toSeq ++ rOf(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(merged == regs)
  }

  test("sketch cube: every lattice point equals registers computed " +
    "directly at that grain") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("d"),
        col("event_type").as("et"), col("user_id"))
      .localCheckpoint()
    val cube = DistinctSketch.rollupRegistersQuery(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)) -> r.getLong(4)).toMap
    def direct(groupCol: String): Map[(String, Long), Long] =
      DistinctSketch.registers(ev, groupCol, "user_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // day grain: rolled-up rows == direct per-day registers
    for (((d, reg), rho) <- direct("d"))
      assert(cube(("d", d, "__all__", reg)) == rho, s"day $d reg $reg")
    // type grain likewise
    for (((et, reg), rho) <- direct("et"))
      assert(cube(("et", "__all__", et, reg)) == rho, s"type $et reg $reg")
    // apex: max over every fine cell
    // .toSeq first: collect on a Map would re-key by register and
    // silently keep one arbitrary cell per register
    val apex = cube.toSeq
      .collect { case (("d_et", _, _, reg), rho) => reg -> rho }
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    for ((reg, rho) <- apex)
      assert(cube(("all", "__all__", "__all__", reg)) == rho,
        s"apex register $reg")
  }

  test("estimate handles empty and saturated register maps") {
    // all-zero registers -> linear counting -> 0 distinct
    assert(DistinctSketch.estimate(Map.empty) == 0.0)
    // one register observed once: estimate stays small and positive
    val one = DistinctSketch.estimate(Map(0L -> 1L))
    assert(one > 0.0 && one < 10.0, s"got $one")
  }
}
