package graft

import org.apache.spark.sql.functions._
import graft.operators.{JoinStrategies, OlapOps, Sessionize}

/** Specs for the round-5 temporal/journey/diagnostic batch: session
  * paths, skew report, SCD2 point-in-time, temporal interval join
  * (q106-q109). */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("temporal join assigns every event to exactly one interval") {
    val out = OlapOps.temporalJoinQuery(spark, sf0001)
    val joined = out.agg(sum("n_events")).collect().head.getLong(0)
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(joined == total,
      "interval occupancy must partition the event stream")
    // occupancy equals the run lengths the SCD2 build collapsed
    val versions = OlapOps.scd2Query(spark, sf0001).count()
    assert(out.count() == versions,
      "every interval must be occupied by at least its opening event")
  }

  test("SCD2 as-of returns at most one state per entity") {
    val out = OlapOps.scd2AsOfQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byUser = out.groupBy(_.getLong(0))
    assert(byUser.values.forall(_.length == 1),
      "point-in-time must be unique per entity")
    out.foreach(r => assert(r.getLong(2) <= OlapOps.AsOfMs,
      "active version must have opened at or before the instant"))
  }

  test("session paths split on the gap and cap at PathMaxLen") {
    // build a drop with one user: 2 events, a >30min gap, then 10
    // events 1s apart -> paths "view>click" and a capped 8-step path
    val base = 1700000000000L
    val head = Seq((1L, base, "view"), (2L, base + 1000, "click"))
    val tail = (0 until 10).map(i =>
      (10L + i, base + 3600000L + i * 1000L, "view"))
    // route through the same nanos-long parquet + reader path as the
    // real table (PipelineOpsSpec convention)
    val ev = (head ++ tail).map { case (id, ms, tp) =>
      (id, ms * 1000000L, 7L, tp, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = tmpDir("paths_in")
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Sessionize.sessionPathsQuery(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view>click" -> 1L,
      Seq.fill(8)("view").mkString(">") -> 1L),
      s"got $out")
  }

  test("native session_window agrees with the manual gap rule (half-open caveat)") {
    // Spark's session_window(ts, gap) closes when the NEXT event's
    // start >= previous start + gap (half-open [t, t+gap)); the manual
    // rule opens a session when diff > gapMs. They coincide for
    // gapMs = gap - 1: diff >= gap  <=>  diff > gap - 1. This pins the
    // off-by-one so a future "simplify to the builtin" refactor can't
    // silently shift exact-gap boundaries.
    import org.apache.spark.sql.functions.{col, count, session_window, timestamp_millis, lit}
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.unix_millis(col("ts")).as("t"))
    val gap = 1800000L
    val native = ev
      .withColumn("ts", timestamp_millis(col("t")))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
    val manual = Sessionize.sessionsFromMs(ev, gap - 1)
      .select(col("user_id"), col("n_events").as("n"))
    // same multiset of (user, session-size) pairs
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("user_id", "n").count()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(native) == key(manual))
  }

  test("skew report's top key matches a direct count, exact rationals") {
    val out = JoinStrategies.skewReportQuery(spark, sf0001).collect()
    assert(out.length == 5)
    val direct = graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id").asc)
      .limit(1).collect().head
    assert(out.head.getLong(0) == direct.getLong(0) &&
      out.head.getLong(1) == direct.getLong(1))
    // skew_e6 of the mean-frequency key would be 1e6; shares < 1e6 each
    out.foreach { r =>
      assert(r.getLong(2) < 1000000L && r.getLong(3) >= r.getLong(2)) }
  }

  test("RI summary reports all edges clean on the consistent star schema") {
    val out = graft.quality.DataQuality.riSummaryQuery(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 7)
    out.foreach { case (edge, (children, orphans)) =>
      assert(children > 0, s"$edge child side must be non-empty")
      assert(orphans == 0L, s"$edge must have no orphans on testdata")
    }
    // and the machinery does catch a planted orphan
    val child = Seq(1L, 2L, 99L).toDF("k")
    val parent = Seq(1L, 2L).toDF("k")
    assert(graft.quality.DataQuality.fkOrphans(child, parent, "k")
      .count() == 1)
  }

  test("parent shares floor-sum to 1e6 within each region") {
    val rows = OlapOps.parentShareQuery(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (region, nations) =>
      val s = nations.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - nations.length,
        s"$region shares sum $s out of floor tolerance")
    }
  }

  test("histogram CDF ends at exactly the full mass") {
    val rows = OlapOps.histogramCdfQuery(spark, sf0001).collect()
    val cums = rows.map(_.getLong(4))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(rows.last.getLong(5) == 1000000L,
      "the last cumulative share must be exactly 1e6")
    val orders = graft.sources.Tables.orders(spark, sf0001).count()
    assert(rows.last.getLong(4) == orders)
  }

  test("conversion deciles cover every user; rates bounded") {
    val rows = Sessionize.conversionByDecileQuery(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val users = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    rows.foreach { r =>
      val (n, c, rate) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c <= n && rate >= 0 && rate <= 1000000L)
      assert(rate == c * 1000000L / n)
    }
  }

  test("freshness audit: exactly one stream is the freshest (lag 0)") {
    val rows = graft.quality.DataQuality.freshnessQuery(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getLong(3) == 0L) >= 1)
    assert(rows.forall(_.getLong(3) >= 0L))
    val freshest = rows.map(_.getLong(2)).max
    rows.foreach(r =>
      assert(r.getLong(3) == freshest - r.getLong(2)))
  }

  test("markov rows floor-sum to at most 1e6 per prev state") {
    val rows = Sessionize.markovQuery(spark, sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (prev, nexts) =>
      val s = nexts.map(_.getLong(3)).sum
      assert(s <= 1000000L && s > 1000000L - nexts.length,
        s"$prev row mass $s out of floor tolerance")
    }
  }

  test("audience overlap respects set bounds on all type pairs") {
    val rows = Sessionize.audienceOverlapQuery(spark, sf0001).collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val (s1, s2, both, j) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(both <= math.min(s1, s2) && j >= 0 && j <= 1000000L)
    }
  }

  test("decay score halves per whole week, planted") {
    val base = 1700000000000L
    val week = 604800000L
    // user 1: events now and 2 weeks ago -> 1024 + 256; user 2: one
    // event 12 weeks ago -> clamped at the 10-week floor -> 1
    val ev = Seq((1L, base), (1L, base - 2 * week), (2L, base - 12 * week))
      .zipWithIndex.map { case ((u, ms), i) =>
        (i.toLong, ms * 1000000L, u, "click", 0.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("decay_fix")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessionize.decayScoreQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1280L, 2L -> 1L), s"got $out")
  }

  test("price dispersion is ordered and non-negative") {
    val rows = OlapOps.priceDispersionQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val spreads = rows.map(_.getLong(4))
    assert(spreads.zip(spreads.tail).forall { case (a, b) => a >= b })
    assert(spreads.forall(_ >= 0L))
    rows.foreach(r => assert(r.getLong(3) >= r.getLong(2)))
  }

  test("column profile: unique key, non-finite values surface as nulls") {
    val rows = graft.quality.DataQuality.columnProfileQuery(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n, idNull, idDistinct) = rows("event_id")
    assert(idNull == 0L && idDistinct == n, "event_id must be a clean PK")
    val nonFinite = graft.sources.Tables.events(spark, sf0001)
      .filter(isnan(col("value")) ||
        col("value") === Double.PositiveInfinity ||
        col("value") === Double.NegativeInfinity).count()
    assert(rows("value_f")._2 == nonFinite,
      "the profile's null count must equal the non-finite count")
    rows.values.foreach { case (rn, nn, nd) =>
      assert(nn <= rn && nd <= rn) }
  }

  test("type-token ratio is a bounded lexical-diversity rational") {
    import graft.operators.CorpusStats
    val rows = CorpusStats.typeTokenRatioQuery(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) > 0L && r.getLong(3) <= 1000000L)
    }
  }

  test("basket lift only reports supported pairs, positive lifts") {
    val rows = OlapOps.basketLiftQuery(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 3L && r.getLong(3) > 0L) }
    val lifts = rows.map(_.getLong(3))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("packing-waste closed form matches the materialized q40 chunks") {
    import graft.operators.TextAnalysis
    val audited = TextAnalysis.packingWasteQuery(spark, sf0001)
      .agg(sum("n_chunks"), sum("fill_tokens")).collect().head
    val chunks = TextAnalysis.chunkQuery(spark, sf0001)
    assert(audited.getLong(0) == chunks.count(),
      "closed-form chunk count must equal the exploded chunk table")
    val fill = chunks.agg(sum("n_tokens")).collect().head.getLong(0)
    assert(audited.getLong(1) == fill,
      "closed-form fill must equal the sum of materialized chunk sizes")
  }

  test("dedup savings agree with the actual dedup transform") {
    import graft.operators.Dedup
    val proj = Dedup.dedupSavingsQuery(spark, sf0001)
      .agg(sum("n_docs"), sum("n_unique"), sum("kept_chars"))
      .collect().head
    val docs = graft.sources.Tables.documents(spark, sf0001)
    assert(proj.getLong(0) == docs.count())
    // within-source dedup: distinct (source, md5) pairs
    val uniq = docs.select(col("source"), md5(col("text"))).distinct()
    assert(proj.getLong(1) == uniq.count())
    // kept_chars equals the mass the transform's representative rule
    // (min doc_id per group) actually keeps
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), md5(col("text"))).orderBy(col("doc_id"))
    val kept = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .agg(sum("n_chars")).collect().head.getLong(0)
    assert(proj.getLong(2) == kept,
      "projection kept_chars must equal the transform's kept mass")
  }

  test("min-max scaling stays in [0, 1e6]; funnel latency is ordered") {
    val scaled = OlapOps.minMaxScaleQuery(spark, sf0001).collect()
    assert(scaled.nonEmpty)
    scaled.foreach { r =>
      val s = r.getLong(3); assert(s >= 0L && s <= 1000000L) }
    val lat = Sessionize.funnelLatencyQuery(spark, sf0001).collect().head
    assert(lat.getLong(0) > 0 && lat.getLong(1) <= lat.getLong(2),
      "median must not exceed p95")
  }

  test("cusum: a sustained +50% shift alarms within days while the " +
    "stable prefix never does; cusum resets under the baseline") {
    import org.apache.spark.sql.functions._
    // 7 baseline days x 4 events (mu7 = 28, slack = 1, h = 28), then
    // 8 days at 6 events: dev_up = 42-28-1 = 13/day -> the scaled
    // cusum crosses h=28 on the 3rd shifted day (13, 26, 39)
    val rows = (0 until 7).flatMap(day =>
      (0 until 4).map(i => s"2024-01-0${day + 1} 12:0$i:00")) ++
      (8 until 16).flatMap(day =>
        (0 until 6).map(i => f"2024-01-$day%02d 12:0$i:00"))
    val ev = rows.toDF("raw")
      .select(to_timestamp(col("raw")).as("ts"), lit("t").as("event_type"))
    val out = graft.operators.OlapOps.cusumDetect(ev).collect()
      .map(r => r.getString(1) ->
        (r.getLong(r.fieldIndex("cusum_up")),
          r.getInt(r.fieldIndex("alert_up")))).toMap
    // stable week: dev_up = 28-28-1 = -1/day, cusum pinned at 0
    for (day <- 1 to 7) {
      val (cu, a) = out(f"2024-01-$day%02d")
      assert(cu == 0L && a == 0, s"day $day: ($cu, $a)")
    }
    assert(out("2024-01-08")._1 == 13L && out("2024-01-08")._2 == 0)
    assert(out("2024-01-09")._1 == 26L && out("2024-01-09")._2 == 0)
    assert(out("2024-01-10")._2 == 1, "3rd shifted day must alarm")
    assert((10 to 15).forall(d => out(f"2024-01-$d%02d")._2 == 1),
      "alarm latches while the shift persists")
  }

  test("burst detect: a planted 5x day flags spike, a collapsed day " +
    "flags drop, the baseline never includes today") {
    import org.apache.spark.sql.functions._
    // 7 baseline days x 4 events, then a 5x day, then a near-zero day
    val rows = (0 until 7).flatMap(day =>
      (0 until 4).map(i => (s"2024-01-0${day + 1} 12:0$i:00"))) ++
      (0 until 20).map(i => s"2024-01-08 12:${10 + i}:00") ++
      Seq("2024-01-09 12:00:00")
    val ev = rows.toDF("raw")
      .select(to_timestamp(col("raw")).as("ts"), lit("t").as("event_type"))
    val flags = graft.operators.OlapOps.burstDetect(ev)
      .collect().map(r => r.getString(1) ->
        (r.getInt(r.fieldIndex("spike")), r.getInt(r.fieldIndex("drop"))))
      .toMap
    assert(flags("2024-01-08") == ((1, 0)), "20 vs 4/day must spike")
    assert(flags("2024-01-09") == ((0, 1)), "1 vs elevated trail must drop")
    assert(flags("2024-01-01") == ((0, 0)), "no baseline, no alert")
    assert(flags("2024-01-05") == ((0, 0)), "steady days stay quiet")
  }

  test("markov eval: predictions are the train-half argmax and hit " +
    "counts are consistent") {
    import org.apache.spark.sql.functions._
    val out = Sessionize.markovEvalQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "hits cannot exceed tests")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
    }
    // independent recompute of the train argmax ((n desc, next asc))
    // from the raw even-user half
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val argmax = graft.sources.Tables.events(spark, sf0001)
      .filter(pmod(col("user_id"), lit(2L)) === 0)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(byTime))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getString(0)).map { case (p, rows) =>
        p -> rows.minBy(r => (-r.getLong(2), r.getString(1))).getString(1)
      }
    out.foreach { r =>
      assert(argmax(r.getString(0)) == r.getString(1),
        s"${r.getString(0)}: prediction must be the train argmax")
    }
  }

  test("inter-arrival cv2: metronome gaps 0, planted bursts well above 1e6") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def frame(rows: Seq[(Long, Long, String)]) =
      rows.toDF("event_id", "ms", "event_type")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
          col("event_type"))
    // metronome: constant 1000 ms gaps -> zero variance -> cv2 = 0
    val metro = (1L to 50L).map(i => (i, i * 1000L, "metro"))
    // bursty: tight 10-ms bursts separated by 100 s silences
    val bursty = (0L until 50L).map { i =>
      (100L + i, (i / 5) * 100000L + (i % 5) * 10L, "bursty") }
    val out = graft.operators.Sessionize
      .interArrivalCv2(frame(metro ++ bursty))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (mn, mMean, mCv2) = out("metro")
    assert(mn == 49L && mMean == 1000L && mCv2 == 0L)
    val (bn, _, bCv2) = out("bursty")
    assert(bn == 49L && bCv2 > 1000000L,
      s"planted bursts must exceed the Poisson reference 1e6: $bCv2")
  }
}
