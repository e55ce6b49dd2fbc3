package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Redaction, Sessionize, TextAnalysis}

/** Specs for the round-4 pipeline operators: sessionization, TF-IDF,
  * repetition signals, PII redaction. Planted fixtures assert exact
  * semantics; the driver's oracle checks the same operators against
  * DuckDB on the shared testdata. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionization splits on gap, counts and bounds sessions") {
    import org.apache.spark.sql.expressions.Window
    // user 1: events at 0s, 60s, 45min (gap>30min -> 2nd session);
    // user 2: single event
    val ev = Seq(
      (1L, 10L, 0L), (1L, 11L, 60000L), (1L, 12L, 2700000L),
      (2L, 20L, 5000L))
      .toDF("user_id", "event_id", "t")
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
    val out = ev
      .withColumn("new_sess",
        when(lag(col("t"), 1).over(byTime).isNull ||
          col("t") - lag(col("t"), 1).over(byTime) > 1800000L, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(byTime))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n"), min("t").as("s"), max("t").as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out((1L, 1L)) == (2L, 0L, 60000L))
    assert(out((1L, 2L)) == (1L, 2700000L, 2700000L))
    assert(out((2L, 1L)) == (1L, 5000L, 5000L))
  }

  test("sessionQuery runs on testdata with positive sessions") {
    val out = Sessionize.sessionQuery(spark, sf0001)
    val rows = out.limit(5).collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSeq == Seq("user_id", "session_seq", "n_events",
      "start_ms", "end_ms", "duration_ms"))
  }

  test("first-touch attribution matches a driver-side re-derivation") {
    val out = Sessionize.attributionQuery(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    val evs = graft.sources.Tables.events(spark, sf0001)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime))
    // independent scala re-derivation: per-user time order, 30-min
    // gap splits, first type of each session wins the credit
    val nSessions = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val nPurch = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for ((_, g) <- evs.groupBy(_._1)) {
      val sorted = g.sortBy(e => (e._4, e._2))
      var entry: String = null
      var prev = Long.MinValue
      for ((_, _, et, t) <- sorted) {
        if (prev == Long.MinValue || t - prev > 1800000L) {
          entry = et; nSessions(entry) += 1
        }
        if (et == "purchase") nPurch(entry) += 1
        prev = t
      }
    }
    for ((et, (s, p, conv)) <- out) {
      assert(s == nSessions(et), s"$et sessions")
      assert(p == nPurch(et), s"$et purchases")
      assert(conv == p * 1000000L / s)
    }
    assert(out.keySet == nSessions.keySet)
    // last-touch: re-derive the predecessor credit the same way
    val lt = Sessionize.lastTouchQuery(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ltRef = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for ((_, g) <- evs.groupBy(_._1)) {
      val sorted = g.sortBy(e => (e._4, e._2))
      var prevT = Long.MinValue
      var prevType: String = null
      for ((_, _, et, t) <- sorted) {
        val opens = prevT == Long.MinValue || t - prevT > 1800000L
        if (et == "purchase")
          ltRef(if (opens) et else prevType) += 1
        prevT = t; prevType = et
      }
    }
    assert(lt == ltRef.toMap, s"last-touch $lt vs $ltRef")
    // both rules distribute the same purchase total
    assert(lt.values.sum == out.values.map(_._2).sum)
  }

  test("batch sessionization agrees with the streaming sessionizer logic") {
    import graft.streaming.EventSessionizer
    // batch: windows over the events table
    val batch = Sessionize.sessionQuery(spark, sf0001, gapMs = 1800000L)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.sortBy(_.getLong(1))
          .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      }
    // streaming twin: the same pure advance() the stateful operator
    // runs per user — closed sessions plus the still-open tail
    val events = graft.sources.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => EventSessionizer.Event(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val streaming = events.groupBy(_.user_id).map { case (u, evs) =>
      val (closed, open) =
        EventSessionizer.advance(None, evs.toSeq, gapMs = 1800000L)
      u -> (closed ++ open).sortBy(_.start)
        .map(s => (s.nEvents, s.start, s.lastTs)).toSeq
    }
    assert(batch.keySet == streaming.keySet)
    batch.foreach { case (u, bs) =>
      assert(bs == streaming(u), s"user $u sessions diverge")
    }
  }

  test("funnel counts are monotone and stage order is enforced") {
    val rows = Sessionize.funnelQuery(spark, sf0001).collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("signup", "view", "click", "purchase"))
    val users = rows.map(_.getLong(2)).toSeq
    // each later stage requires all earlier ones: counts never grow
    assert(users.zip(users.tail).forall { case (a, b) => a >= b },
      s"funnel must be monotone non-increasing: $users")
    assert(users.head > 0, "some user signs up in the fixture corpus")
    // order-enforcement fixture: purchase BEFORE signup must not
    // count. ts written as epoch-NANOS longs — the on-disk contract
    // Tables.events expects (TIMESTAMP(NANOS) read nanosAsLong).
    def nanos(minute: Long): Long = minute * 60L * 1000000000L
    val ev = Seq(
      (1L, "purchase", nanos(0)), (1L, "signup", nanos(60)),
      (2L, "signup", nanos(0)), (2L, "view", nanos(10)),
      (2L, "click", nanos(20)), (2L, "purchase", nanos(30)))
      .toDF("user_id", "event_type", "ts")
    val dir = tmpDir("funnel_fix")
    // route through the same parquet+reader path as the real table
    ev.withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val out = Sessionize.funnelQuery(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("signup" -> 2L, "view" -> 1L, "click" -> 1L,
      "purchase" -> 1L),
      s"user 1's pre-signup purchase must not complete the funnel: $out")
  }

  test("scd2 intervals chain gaplessly per user, versions dense") {
    import graft.operators.OlapOps
    val rows = OlapOps.scd2Query(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_.getLong(ivs.head.fieldIndex("version")))
      // versions 1..n dense
      assert(sorted.map(_.getLong(sorted.head.fieldIndex("version"))).toSeq ==
        (1L to sorted.length).toSeq, s"user $u versions not dense")
      // consecutive intervals chain: valid_to == next valid_from;
      // only the last interval is open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(a.fieldIndex("valid_to")) &&
            a.getLong(a.fieldIndex("valid_to")) ==
              b.getLong(b.fieldIndex("valid_from")),
            s"user $u: interval must close at successor start")
          // a transition row means the type actually changed
          assert(a.getString(1) != b.getString(1),
            s"user $u: consecutive intervals must differ in type")
        case _ => ()
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")),
        s"user $u: last interval must be open")
    }
  }

  test("approx_count_distinct tracks exact distincts within rsd bounds") {
    // the approximate-aggregate surface: HLL++ sketches merge
    // associatively across partitions (one map-side sketch per
    // partition, constant bytes per group — the at-scale shape for
    // distinct counts over 100 TB, where exact countDistinct forces a
    // full shuffle of the key universe). Not oracle-checked (DuckDB's
    // HLL differs); asserted against the exact count instead.
    val ev = graft.sources.Tables.events(spark, sf0001)
    val rows = ev.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx")).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      assert(e > 0 && math.abs(a - e).toDouble / e <= 0.15,
        s"${r.getString(0)}: approx $a vs exact $e drifts past 3x rsd")
    }
    // determinism: same data, same sketch, same answer
    val again = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.05)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(again(r.getString(0)) == r.getLong(2)))
  }

  test("cube emits all four grouping sets consistently") {
    import graft.operators.OlapOps
    val rows = OlapOps.cubeQuery(spark, sf0001).collect()
    val byGid = rows.groupBy(_.getInt(2))
    assert(byGid.keySet == Set(0, 1, 2, 3), s"gids: ${byGid.keySet}")
    assert(byGid(3).length == 1, "one grand-total row")
    val total = byGid(3).head.getLong(3)
    // every grouping set partitions the same row universe
    (0 to 2).foreach { gid =>
      assert(byGid(gid).map(_.getLong(3)).sum == total,
        s"gid=$gid counts must sum to the grand total $total")
    }
    // cube adds the status-only set rollup lacks: gid=2 rows keep
    // status but fold priority to ALL
    assert(byGid(2).forall(r => r.getString(0) == "ALL"
      && r.getString(1) != "ALL"))
  }

  test("tf-idf ranks rarer terms above common ones, exact scores") {
    val out = TextAnalysis.tfidfQuery(spark, sf0001, topK = 2)
    val first = out.filter(col("term_rank") === 1).limit(3).collect()
    assert(first.nonEmpty)
    // exact integer score recomputation for one (doc, term) row
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val n = docs.count()
    val r = out.limit(1).collect().head
    val (docId, term, score) = (r.getLong(0), r.getString(1), r.getLong(2))
    val toks = docs.filter(col("doc_id") === docId)
      .select(graft.functions.TextFunctions.tokens(col("text")))
      .collect().head.getSeq[String](0)
    val tf = toks.count(_ == term).toLong
    val df = docs
      .select(explode(array_distinct(
        graft.functions.TextFunctions.tokens(col("text")))).as("t"))
      .filter(col("t") === term).count()
    assert(score == tf * 1000000L * n / df)
  }

  test("repetition signals: all-same doc maxes out, distinct doc is 0") {
    // plant via a tiny in-memory frame exercised through the same
    // column constructions as repetitionQuery
    val docs = Seq(
      (1L, "spark spark spark spark"),
      (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val base = docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("nd", size(array_distinct(col("toks"))))
      .select(col("doc_id"), expr("((n - nd) * 1000000L) div n").as("dupfrac"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base(1L) == 750000L) // 3 of 4 tokens are repeats
    assert(base(2L) == 0L)
    val out = TextAnalysis.repetitionQuery(spark, sf0001)
    val row = out.limit(1).collect().head
    assert(row.getLong(1) > 0) // n_tokens
  }

  test("packing offsets: two-phase prefix sum equals the global cumsum") {
    import graft.operators.PrepPipeline
    // token counts 3,2,4,1,5 across two 2-doc blocks + a tail; seqLen 4
    val docs = Seq(
      (0L, "a b c"), (1L, "a b"), (2L, "a b c d"), (3L, "a"),
      (4L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = PrepPipeline.packingOffsets(docs, seqLen = 4L, blockSize = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // offsets: 0, 3, 5, 9, 10; pack = offset div 4
    assert(out.toSeq == Seq(
      (0L, 3L, 0L, 0L), (1L, 2L, 3L, 0L), (2L, 4L, 5L, 1L),
      (3L, 1L, 9L, 2L), (4L, 5L, 10L, 2L)))
  }

  test("packing offsets: phase-2 collect is bounded for a corpus >> blockSize^2") {
    import graft.operators.PrepPipeline
    // 200k docs of 3 tokens each — global_offset must equal 3 * doc_id.
    val docs = spark.range(200000).toDF("doc_id")
      .withColumn("text", lit("tok tok tok"))
    // auto mode derives blockSize ~ sqrt(range), clamped so the block
    // count (= the driver-side collect size) stays under the constant
    // bound regardless of corpus size
    // distinct block ids over [lo, hi]: block boundaries need not
    // align with lo, so this can exceed range/bs by one
    def distinctBlocks(lo: Long, hi: Long, b: Long): Long =
      hi / b - lo / b + 1L
    val bs = PrepPipeline.derivedBlockSize(0L, 199999L)
    assert(bs >= 447, s"sqrt-scale block size expected, got $bs")
    assert(distinctBlocks(0L, 199999L, bs) <= PrepPipeline.PhaseTwoMaxBlocks)
    // boundary-straddling ranges used to derive maxBlocks + 1 blocks
    // and trip the auto-mode require with advice to do what the
    // caller already did
    for ((lo, hi) <- Seq((1L, 1L << 32), (0L, (1L << 32) - 1L),
                         (7L, 7L + (1L << 33)), (5L, 5L))) {
      val b = PrepPipeline.derivedBlockSize(lo, hi)
      assert(distinctBlocks(lo, hi, b) <= PrepPipeline.PhaseTwoMaxBlocks,
        s"range [$lo,$hi] bs=$b yields ${distinctBlocks(lo, hi, b)} blocks")
    }
    val out = PrepPipeline.packingOffsets(docs, seqLen = 1000L)
      .filter(col("doc_id").isin(0L, 1L, 12345L, 199999L))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == (0L, 0L))
    assert(out(1L) == (3L, 0L))
    assert(out(12345L) == (37035L, 37L))
    assert(out(199999L) == (599997L, 599L))
    // an explicit blockSize that would exceed the bound fails loudly
    // (200k blocks of 1 doc each > 2^16) instead of collecting them
    intercept[IllegalArgumentException] {
      PrepPipeline.packingOffsets(docs, seqLen = 1000L, blockSize = 1L)
    }
  }

  test("gap-fill emits zero rows for every empty hour in the range") {
    import graft.operators.OlapOps
    // two events 3 hours apart -> 4 spine hours, 2 empty cells for
    // type 'a' plus all 4 for 'b' (never occurs)
    val ev = Seq(
      (Timestamp.valueOf("2024-03-01 10:15:00"), "a"),
      (Timestamp.valueOf("2024-03-01 13:05:00"), "a"))
      .toDF("ts", "event_type")
    val out = OlapOps.gapFill(ev, Seq("a", "b")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out.size == 8)
    assert(out(("2024-03-01 10", "a")) == 1L)
    assert(out(("2024-03-01 13", "a")) == 1L)
    assert(out(("2024-03-01 11", "a")) == 0L)
    assert(out(("2024-03-01 12", "a")) == 0L)
    assert(Seq("10", "11", "12", "13").forall(h =>
      out((s"2024-03-01 $h", "b")) == 0L))
  }

  test("outlier fences: quartiles are corpus values, outliers beyond fences") {
    import graft.operators.OlapOps
    val rows = OlapOps.outlierFencesQuery(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (q1, q3, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(q1 <= q3)
      assert(lo == q1 - (3 * (q3 - q1)) / 2)
      assert(hi == q3 + (3 * (q3 - q1)) / 2)
      assert(r.getLong(6) >= 0 && r.getLong(6) < r.getLong(1))
    }
  }

  test("transition matrix counts pair the ordered stream exactly") {
    import graft.operators.Sessionize
    val out = Sessionize.transitionsQuery(spark, sf0001)
    val total = out.agg(sum("n")).collect().head.getLong(0)
    // sum over transitions = total events - one first-event per user
    val ev = graft.sources.Tables.events(spark, sf0001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(total == expected, s"$total vs $expected")
  }

  test("concurrency curve: two-phase prefix sum equals the global sweep") {
    import graft.operators.Sessionize
    val out = Sessionize.concurrencyQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    // reference: global single-window sweep on the collected points
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
      ts.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, t) => List((t, t))
        case ((s, e) :: rest, t) =>
          if (t - e > 1800000L) (t, t) :: (s, e) :: rest
          else (s, t) :: rest
      }
    }.toSeq
    val pts = (sessions.map(s => (s._1, 1L)) ++
      sessions.map(s => (s._2 + 1, -1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var open = 0L
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    pts.foreach { case (t, d) =>
      open += d
      val h = t / 3600000L
      val (mo, np) = expected.getOrElse(h, (Long.MinValue, 0L))
      expected(h) = (math.max(mo, open), np + 1)
    }
    val got = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected.toMap, s"mismatch: got ${got.size} hours")
  }

  test("retention: day-0 count equals cohort size, offsets non-negative") {
    import graft.operators.Sessionize
    val rows = Sessionize.retentionQuery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0L))
    // every user is active on their own first day, so for each cohort
    // the day-0 count must be >= any later offset's count
    rows.groupBy(_._1).foreach { case (c, rs) =>
      val day0 = rs.find(_._2 == 0L).map(_._3)
      assert(day0.isDefined, s"cohort $c missing day-0 row")
      assert(rs.forall(_._3 <= day0.get),
        s"cohort $c: day-0 must dominate: $rs")
    }
  }

  test("redaction scrubs digit runs and counts patterns") {
    val out = Redaction.redactQuery(spark, sf0001)
      .filter(col("src") === "customer").limit(2).collect()
    assert(out.nonEmpty)
    // customer names carry exactly one digit run each
    assert(out.forall(_.getLong(2) == 1L))
    // scrubbed digests must not equal the raw-name digest
    val raw = graft.sources.Tables.customer(spark, sf0001)
      .select(md5(col("c_name"))).limit(1).collect().head.getString(0)
    assert(out.head.getString(4) != raw)
  }

  test("set ops: branches are disjoint and cover both year sets") {
    import graft.operators.OlapOps
    val out = OlapOps.setOpsQuery(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // every customer appears in exactly one branch
    assert(out.map(_._1).distinct.length == out.length)
    val o = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
    val a = o.filter(col("y") === 1994).select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val b = o.filter(col("y") === 1995).select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val got = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(got.getOrElse("both", Set.empty) == (a intersect b))
    assert(got.getOrElse("only_1994", Set.empty) == (a diff b))
    assert(got.getOrElse("only_1995", Set.empty) == (b diff a))
  }

  test("pmi lift: band is corpus-relative, supports bounded, lift exact") {
    import graft.operators.CorpusStats
    val out = CorpusStats.pmiQuery(spark, sf0001).collect()
    assert(out.nonEmpty, "fixture corpus must produce co-occurring pairs")
    val nd = graft.sources.Tables.documents(spark, sf0001).count()
    out.foreach { r =>
      val (nab, na, nb, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nab <= na && nab <= nb, "support cannot exceed either df")
      assert(na * 100 >= nd && na * 100 <= nd * 95, "df band violated")
      assert(lift == nab * nd * 1000000L / (na * nb), "lift formula")
    }
  }
}
