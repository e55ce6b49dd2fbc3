package graft

import java.nio.file.{Files, Paths}
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  private def writeDrop(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))

  test("AvailableNow file ingest processes the drop dir exactly once") {
    val drop = tmpDir("stream_drop")
    val out = tmpDir("stream_out")
    val ckpt = tmpDir("stream_ckpt")
    writeDrop(drop, "batch1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10Z","user_id":7,"event_type":"click","value":1.5}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:40Z","user_id":7,"event_type":"view","value":2.5}""",
      """{"event_id":3,"ts":"2024-01-01T00:01:10Z","user_id":8,"event_type":"click","value":3.0}"""))
    EventStream.ingestAvailableNow(spark, drop, out, ckpt)
    assert(spark.read.parquet(out).count() == 3)
    // second invocation with same checkpoint: no new files -> no new rows
    EventStream.ingestAvailableNow(spark, drop, out, ckpt)
    assert(spark.read.parquet(out).count() == 3)
    // new drop arrives -> only it is processed (incremental semantics)
    writeDrop(drop, "batch2.json", Seq(
      """{"event_id":4,"ts":"2024-01-01T00:02:05Z","user_id":9,"event_type":"purchase","value":9.9}"""))
    EventStream.ingestAvailableNow(spark, drop, out, ckpt)
    assert(spark.read.parquet(out).count() == 4)
  }

  test("stream-stream interval join matches the batch join, bounded state") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    val clickDrop = tmpDir("ssj_clicks")
    val purchDrop = tmpDir("ssj_purch")
    val out = tmpDir("ssj_out")
    val ckpt = tmpDir("ssj_ckpt")
    // user 7: purchase 5 min before click (match), purchase 20 min
    // before (outside window), purchase AFTER click (no match);
    // user 8: click with no purchases
    writeDrop(clickDrop, "c1.json", Seq(
      """{"event_id":100,"ts":"2024-01-01T01:00:00Z","user_id":7,"event_type":"click","value":0.0}""",
      """{"event_id":101,"ts":"2024-01-01T01:30:00Z","user_id":8,"event_type":"click","value":0.0}"""))
    writeDrop(purchDrop, "p1.json", Seq(
      """{"event_id":200,"ts":"2024-01-01T00:55:00Z","user_id":7,"event_type":"purchase","value":9.5}""",
      """{"event_id":201,"ts":"2024-01-01T00:40:00Z","user_id":7,"event_type":"purchase","value":1.0}""",
      """{"event_id":202,"ts":"2024-01-01T01:05:00Z","user_id":7,"event_type":"purchase","value":2.0}"""))
    val joined = graft.streaming.StreamJoin.clickPurchaseJoin(
      EventStream.readEventStream(spark, clickDrop),
      EventStream.readEventStream(spark, purchDrop))
    val q = joined.writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(out)
      .select("click_id", "purchase_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((100L, 200L, 9.5)))
    // the equivalent batch join over the same files agrees
    val cb = spark.read.schema(EventStream.eventSchema).json(clickDrop)
    val pb = spark.read.schema(EventStream.eventSchema).json(purchDrop)
    val batch = cb.as("c").join(pb.as("p"),
      col("c.user_id") === col("p.user_id") &&
        col("p.ts") <= col("c.ts") &&
        col("p.ts") >= col("c.ts") - expr("interval 10 minutes"))
      .select(col("c.event_id"), col("p.event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(batch.toSeq == Seq((100L, 200L)))
  }

  test("sessionizer advance closes sessions at the gap (pure logic)") {
    import graft.streaming.EventSessionizer._
    def ev(id: Long, t: Long) =
      Event(id, new java.sql.Timestamp(t), 1L, "click", 1.0)
    val (closed, open) = advance(None,
      Seq(ev(1, 0), ev(2, 1000), ev(3, 100000)), gapMs = 30000)
    assert(closed.map(_.nEvents) == Seq(2))
    assert(open.exists(s => s.nEvents == 1 && s.start == 100000))
    // events within gap extend the open session
    val (closed2, open2) = advance(open, Seq(ev(4, 110000)), gapMs = 30000)
    assert(closed2.isEmpty && open2.exists(_.nEvents == 2))
  }

  test("streaming sessionization emits closed sessions across batches") {
    import graft.streaming.EventSessionizer
    val drop = tmpDir("sess_drop")
    val ckpt = tmpDir("sess_ckpt")
    val out = tmpDir("sess_out")
    // user 7: two events 10s apart (one session), then an event 2h
    // later -> closes session 1 when it arrives in batch 2
    writeDrop(drop, "b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":7,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:10Z","user_id":7,"event_type":"view","value":2.0}"""))
    EventSessionizer.sessionizeAvailableNow(spark, drop, out, ckpt,
      gapMs = 30 * 60 * 1000)
    writeDrop(drop, "b2.json", Seq(
      """{"event_id":3,"ts":"2024-01-01T02:00:00Z","user_id":7,"event_type":"click","value":4.0}"""))
    EventSessionizer.sessionizeAvailableNow(spark, drop, out, ckpt,
      gapMs = 30 * 60 * 1000)
    val rows = spark.read.parquet(out)
      .select("user_id", "n_events", "sum_value").collect()
    assert(rows.length == 1, rows.mkString(","))
    assert(rows.head.getLong(1) == 2 && rows.head.getDouble(2) == 3.0)
  }

  test("streaming funnel advance equals the batch funnel on the corpus") {
    import graft.streaming.FunnelStream
    // batch: per-stage user counts from the oracle-checked query
    val batch = graft.operators.Sessionize.funnelQuery(spark, sf0001)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // streaming twin: the same pure advance() the stateful operator
    // runs, folded over each user's full history
    val events = graft.sources.Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => FunnelStream.Event(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val hits = events.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
      FunnelStream.advance(FunnelStream.FunnelState(Seq.empty),
        evs.toSeq, u)._1
    }
    val streaming = hits.groupBy(_.step).map { case (s, h) =>
      s -> h.map(_.user_id).distinct.length.toLong
    }
    FunnelStream.stages.foreach { s =>
      assert(streaming.getOrElse(s, 0L) == batch(s),
        s"stage $s diverges: streaming=$streaming batch=$batch")
    }
  }

  test("streaming funnel completes stages across batches with recovery") {
    import graft.streaming.FunnelStream
    val drop = tmpDir("fun_drop")
    val ckpt = tmpDir("fun_ckpt")
    val out = tmpDir("fun_out")
    // batch 1: user 7 signs up and views; user 8 purchases (no signup
    // -> never counts)
    writeDrop(drop, "b1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":7,"event_type":"signup","value":0.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:05:00Z","user_id":7,"event_type":"view","value":0.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:06:00Z","user_id":8,"event_type":"purchase","value":0.0}"""))
    FunnelStream.funnelAvailableNow(spark, drop, out, ckpt)
    // batch 2 (separate invocation -> state rides the checkpoint):
    // user 7 clicks then purchases
    writeDrop(drop, "b2.json", Seq(
      """{"event_id":4,"ts":"2024-01-01T00:10:00Z","user_id":7,"event_type":"click","value":0.0}""",
      """{"event_id":5,"ts":"2024-01-01T00:15:00Z","user_id":7,"event_type":"purchase","value":0.0}"""))
    FunnelStream.funnelAvailableNow(spark, drop, out, ckpt)
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getString(r.fieldIndex("step")))).toSet
    assert(rows == Set((7L, "signup"), (7L, "view"), (7L, "click"),
      (7L, "purchase")),
      s"user 7 completes all four stages across two batches: $rows")
    // batch 3: user 7 signs up AGAIN while the completed funnel's
    // tombstone state is still live — must NOT restart the funnel and
    // emit a duplicate (7, signup) row (each user counts once per
    // stage, as in the batch funnel)
    writeDrop(drop, "b3.json", Seq(
      """{"event_id":6,"ts":"2024-01-01T00:16:00Z","user_id":7,"event_type":"signup","value":0.0}"""))
    FunnelStream.funnelAvailableNow(spark, drop, out, ckpt)
    val signups = spark.read.parquet(out).collect()
      .count(r => r.getLong(r.fieldIndex("user_id")) == 7L &&
        r.getString(r.fieldIndex("step")) == "signup")
    assert(signups == 1, s"duplicate signup must not re-enter the funnel")
  }

  test("streaming dedup drops duplicate content within the horizon") {
    import graft.streaming.DocStream
    val drop = tmpDir("doc_drop")
    val out = tmpDir("doc_out")
    val ckpt = tmpDir("doc_ckpt")
    // b1: docs 1/2 identical content (punctuation differs -> same
    // fingerprint), doc 3 distinct
    writeDrop(drop, "b1.json", Seq(
      """{"doc_id":1,"ts":"2024-01-01T00:00:10Z","text":"Hello, World!","source":"a"}""",
      """{"doc_id":2,"ts":"2024-01-01T00:00:20Z","text":"hello   world","source":"b"}""",
      """{"doc_id":3,"ts":"2024-01-01T00:00:30Z","text":"something else","source":"a"}"""))
    DocStream.dedupAvailableNow(spark, drop, out, ckpt)
    assert(spark.read.parquet(out).count() == 2)
    // b2: another duplicate of doc 1 arrives in a LATER drain, still
    // within the horizon -> checkpointed state drops it; doc 5 is new
    writeDrop(drop, "b2.json", Seq(
      """{"doc_id":4,"ts":"2024-01-01T00:10:00Z","text":"HELLO WORLD","source":"c"}""",
      """{"doc_id":5,"ts":"2024-01-01T00:10:10Z","text":"fresh content","source":"c"}"""))
    DocStream.dedupAvailableNow(spark, drop, out, ckpt)
    val docs = spark.read.parquet(out).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(docs == Set(1L, 3L, 5L), docs.toSeq.sorted.mkString(","))
  }

  test("streaming upsert sink maintains latest-per-key across drains") {
    import graft.streaming.UpsertStream
    val drop = tmpDir("ups_drop")
    val root = tmpDir("ups_root")
    val ckpt = tmpDir("ups_ckpt")
    // drain 1: docs 1/2, with two versions of doc 1 IN the batch ->
    // batch-local reduce keeps the later one
    writeDrop(drop, "b1.json", Seq(
      """{"doc_id":1,"ts":"2024-01-01T00:00:10Z","text":"v1 of one","source":"a"}""",
      """{"doc_id":1,"ts":"2024-01-01T00:00:20Z","text":"v2 of one","source":"a"}""",
      """{"doc_id":2,"ts":"2024-01-01T00:00:30Z","text":"two","source":"a"}"""))
    UpsertStream.upsertAvailableNow(spark, drop, root, ckpt,
      key = "doc_id", version = "ts")
    val t1 = UpsertStream.readTable(spark, root).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    assert(t1 == Map(1L -> "v2 of one", 2L -> "two"), t1.toString)
    // drain 2: doc 2 updated, doc 3 appended -> next snapshot merges
    writeDrop(drop, "b2.json", Seq(
      """{"doc_id":2,"ts":"2024-01-01T00:10:00Z","text":"two updated","source":"b"}""",
      """{"doc_id":3,"ts":"2024-01-01T00:10:10Z","text":"three","source":"b"}"""))
    UpsertStream.upsertAvailableNow(spark, drop, root, ckpt,
      key = "doc_id", version = "ts")
    val t2 = UpsertStream.readTable(spark, root).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("text"))).toMap
    assert(t2 == Map(1L -> "v2 of one", 2L -> "two updated", 3L -> "three"),
      t2.toString)
    // the old snapshot is still intact (readers see a consistent table
    // until the pointer moves)
    assert(spark.read.parquet(s"$root/v0").count() == 2L)
  }

  test("stream-static join labels arrivals against the corpus index") {
    import graft.streaming.DocStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val drop = tmpDir("ss_drop")
    val out = tmpDir("ss_out")
    val ckpt = tmpDir("ss_ckpt")
    // static corpus: docs 100/101; fingerprint normalizes case/punct
    val corpus = Seq((100L, "Hello, World!"), (101L, "existing corpus text"))
      .toDF("doc_id", "text")
    val idx = DocStream.corpusFingerprintIndex(corpus)
    // arrivals: doc 1 duplicates corpus doc 100 (modulo layout),
    // doc 2 is novel
    writeDrop(drop, "b1.json", Seq(
      """{"doc_id":1,"ts":"2024-01-01T00:00:10Z","text":"hello   WORLD","source":"a"}""",
      """{"doc_id":2,"ts":"2024-01-01T00:00:20Z","text":"never seen before","source":"a"}"""))
    val q = DocStream.labelAgainstCorpus(
        DocStream.readDocStream(spark, drop), idx)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        (r.getLong(r.fieldIndex("is_known_dup")),
         if (r.isNullAt(r.fieldIndex("corpus_doc_id"))) -1L
         else r.getLong(r.fieldIndex("corpus_doc_id")))).toMap
    assert(rows == Map(1L -> ((1L, 100L)), 2L -> ((0L, -1L))),
      s"doc 1 must link to corpus doc 100, doc 2 clean: $rows")
  }

  test("watermarked windowed aggregation groups by event-time minute") {
    val drop = tmpDir("stream_drop2")
    val ckpt = tmpDir("stream_ckpt2")
    writeDrop(drop, "b.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:50Z","user_id":2,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:01:10Z","user_id":3,"event_type":"click","value":4.0}"""))
    EventStream.aggregateAvailableNow(spark, drop, "win_counts", ckpt)
    val rows = spark.sql(
      "SELECT window_start, n, sum_value FROM win_counts ORDER BY window_start")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 3.0)
    assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 4.0)
  }

  test("streaming CMS partials merge to exactly the batch grid") {
    import graft.streaming.SketchStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val drop = tmpDir("cms_drop")
    val grid = tmpDir("cms_grid")
    val ckpt = tmpDir("cms_ckpt")
    def doc(id: Int, text: String) =
      s"""{"doc_id":$id,"ts":"2024-01-01T00:0$id:00Z","text":"$text","source":"s"}"""
    writeDrop(drop, "d1.json", Seq(
      doc(1, "alpha beta alpha"), doc(2, "beta gamma")))
    SketchStream.cmsAvailableNow(spark, drop, grid, ckpt)
    // a second drop arrives -> a second partial, first is untouched
    writeDrop(drop, "d2.json", Seq(doc(3, "alpha delta delta")))
    SketchStream.cmsAvailableNow(spark, drop, grid, ckpt)
    def gridMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = gridMap(SketchStream.mergedGrid(spark, grid))
    val batch = gridMap(graft.operators.CorpusStats.cmsGrid(
      Seq("alpha beta alpha", "beta gamma", "alpha delta delta")
        .toDF("text")))
    assert(streamed == batch,
      "cell-wise merge of per-batch partials must equal the corpus grid")
    // 8 tokens counted once per sketch row (d=3) -> 24 total mass
    assert(streamed.values.sum == 24L)
  }

  test("streaming HLL register partials max-merge to the batch registers") {
    import graft.streaming.SketchStream
    import graft.operators.DistinctSketch
    import spark.implicits._
    val drop = tmpDir("hll_drop")
    val regs = tmpDir("hll_regs")
    val ckpt = tmpDir("hll_ckpt")
    def ev(id: Int, user: Long, typ: String) =
      s"""{"event_id":$id,"ts":"2024-01-01T00:0$id:00Z","user_id":$user,"event_type":"$typ","value":1.0}"""
    writeDrop(drop, "e1.json", Seq(
      ev(1, 7L, "click"), ev(2, 8L, "click"), ev(3, 7L, "view")))
    SketchStream.hllAvailableNow(spark, drop, regs, ckpt)
    // a second drop with an overlapping user arrives in its own batch
    writeDrop(drop, "e2.json", Seq(ev(4, 7L, "click"), ev(5, 9L, "view")))
    SketchStream.hllAvailableNow(spark, drop, regs, ckpt)
    def regMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = regMap(SketchStream.mergedRegisters(spark, regs))
    val batch = regMap(DistinctSketch.registers(
      Seq((7L, "click"), (8L, "click"), (7L, "view"),
        (7L, "click"), (9L, "view")).toDF("user_id", "event_type"),
      "event_type", "user_id"))
    assert(streamed == batch,
      "max-merge of per-batch registers must equal the corpus registers")
  }

  test("streaming AGMS partials sum-merge to the batch grid and estimate") {
    import graft.streaming.SketchStream
    import graft.operators.JoinStrategies
    import spark.implicits._
    val drop = tmpDir("agms_drop")
    val grid = tmpDir("agms_grid")
    val ckpt = tmpDir("agms_ckpt")
    def ev(id: Int, user: Long) =
      s"""{"event_id":$id,"ts":"2024-01-01T00:0$id:00Z","user_id":$user,"event_type":"click","value":1.0}"""
    // drop 1: user 7 twice, user 8 once; drop 2: user 7 once more
    writeDrop(drop, "a1.json", Seq(ev(1, 7L), ev(2, 7L), ev(3, 8L)))
    SketchStream.agmsAvailableNow(spark, drop, grid, ckpt)
    writeDrop(drop, "a2.json", Seq(ev(4, 7L)))
    SketchStream.agmsAvailableNow(spark, drop, grid, ckpt)
    def cellMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = cellMap(SketchStream.mergedAgms(spark, grid))
    val batch = cellMap(JoinStrategies.agmsCells(
      Seq(("7", 3L), ("8", 1L)).toDF("k", "cnt")))
    assert(streamed == batch,
      "cell-wise sum of per-batch signed grids must equal the corpus grid")
    // the merged grid's F2 estimate sees the CROSS-batch count: user 7
    // has 3 events total -> exact F2 = 9 + 1 = 10, and with 2 sparse
    // keys in 1024 buckets no collision occurs, so every row is exact
    val ests = JoinStrategies.agmsEstimates(SketchStream.mergedAgms(spark, grid))
      .collect().map(_.getLong(1))
    assert(ests.forall(_ == 10L), s"got ${ests.toSeq}")
  }

  test("streaming monitor timeline aggregates to the batch rule suite") {
    import graft.streaming.MonitorStream
    import org.apache.spark.sql.functions._
    val drop = tmpDir("mon_drop")
    val mon = tmpDir("mon_out")
    val ckpt = tmpDir("mon_ckpt")
    writeDrop(drop, "m1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10Z","user_id":7,"event_type":"purchase","value":0.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:40Z","user_id":8,"event_type":"click","value":2.5}"""))
    MonitorStream.monitorAvailableNow(spark, drop, mon, ckpt)
    // a later drop with a second violation arrives in its own batch
    writeDrop(drop, "m2.json", Seq(
      """{"event_id":3,"ts":"2023-06-01T00:00:00Z","user_id":9,"event_type":"view","value":1.0}"""))
    MonitorStream.monitorAvailableNow(spark, drop, mon, ckpt)
    val totals = MonitorStream.ruleTotals(spark, mon).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // zero-value purchase + out-of-2024 timestamp, one each
    assert(totals("purchase_value_positive") == ((3L, 1L)))
    assert(totals("ts_in_2024") == ((3L, 1L)))
    assert(totals("known_event_type") == ((3L, 0L)))
    // and the aggregated timeline equals the batch suite on the union
    val batch = graft.quality.DataQuality.assertionSuite(
        MonitorStream.withRuleColumns(
          spark.read.schema(EventStream.eventSchema).json(drop)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(totals == batch)
  }

  test("q145 monitor timeline query streams multi-batch and equals batch suite") {
    import graft.streaming.MonitorStream
    val rows = MonitorStream.monitorTimelineQuery(spark, sf0001).collect()
    val streamed = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.quality.DataQuality.assertionSuiteQuery(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch,
      s"streamed totals must equal the batch suite: $streamed vs $batch")
    // the drop really went through in multiple micro-batches: 6 files
    // at maxFilesPerTrigger=2 -> exactly 3 timeline rows per rule
    assert(rows.forall(_.getLong(3) == 3L),
      s"expected 3 micro-batches per rule, got ${rows.map(_.getLong(3)).toSeq}")
  }

  test("q149 parquet-sink ingest round-trips sessions losslessly") {
    val streamed = graft.streaming.EventStream
      .ingestSessionQuery(spark, sf0001).collect().map(_.toSeq)
    val batch = graft.operators.Sessionize
      .sessionQuery(spark, sf0001).collect().map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      "sessions over the sunk table must equal sessions over raw events")
  }

  test("dual watermark: one-wave-late merges, two-waves-late drops") {
    import graft.streaming.LateStream
    import org.apache.spark.sql.streaming.Trigger
    val drop = tmpDir("late_drop")
    val out = tmpDir("late_out")
    val ckpt = tmpDir("late_ckpt")
    def ev(id: Int, ts: String) =
      s"""{"event_id":$id,"ts":"2024-01-01T$ts:00Z","event_type":"click"}"""
    // horizon = 10 min, window = 1 h.
    // wave 0: 01:00 row opens window [01,02); 02:30 max -> wm1 = 02:20
    // wave 1: 01:10 is ONE wave late (window end 02:00 < wm1) but the
    //         late filter in batch 1 uses wm0 = -inf -> MERGES;
    //         05:00 max -> wm2 = 04:50
    // wave 2: 01:20 is TWO waves late — batch 2's late filter uses
    //         wm1 = 02:20 > window end 02:00 -> DROPPED;
    //         09:00 pushes the final watermark to 08:50
    val waves = Seq(
      Seq(ev(1, "01:00"), ev(2, "02:30")),
      Seq(ev(3, "01:10"), ev(4, "05:00")),
      Seq(ev(5, "01:20"), ev(6, "09:00")))
    waves.zipWithIndex.foreach { case (lines, k) =>
      writeDrop(drop, s"wave$k.json", lines)
      Files.setLastModifiedTime(Paths.get(drop, s"wave$k.json"),
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + k * 1000L))
    }
    val q = LateStream.windowedCounts(
        spark.readStream.schema(LateStream.lateSchema)
          .option("maxFilesPerTrigger", "1").json(drop))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped == 1, s"exactly the two-waves-late row drops: $dropped")
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val hour = 3600000L
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .toEpochMilli
    // [01,02): wave-0 row + merged one-wave-late row, NOT the dropped
    // two-waves-late row; [02,03) and [05,06) close under the final
    // 08:50 watermark; [09,10) stays open and is never emitted.
    assert(got == Map(
      base + 1 * hour -> 2L,
      base + 2 * hour -> 1L,
      base + 5 * hour -> 1L), s"emitted windows diverge: $got")
  }

  test("session_window: touch-merge gap boundary, cross-batch session merge") {
    import graft.streaming.SessionStream
    import org.apache.spark.sql.streaming.Trigger
    val drop = tmpDir("sess_drop")
    val out = tmpDir("sess_out")
    val ckpt = tmpDir("sess_ckpt")
    def ev(id: Int, user: Int, ts: String) =
      s"""{"event_id":$id,"user_id":$user,"ts":"2024-01-01T$ts:00Z"}"""
    // gap = 30 min. user 1: events exactly 30 min apart -> the
    // windows [01:00,01:30) and [01:30,02:00) TOUCH and session
    // windows merge on touch (inclusive boundary — measured, and what
    // this test pins); user 2: 29 min apart -> one session; user 3:
    // wave-0 event extended by a wave-1 event 10 min later -> the
    // open session must MERGE across batches.
    writeDrop(drop, "wave0.json", Seq(
      ev(1, 1, "01:00"), ev(2, 1, "01:30"),
      ev(3, 2, "01:00"), ev(4, 2, "01:29"),
      ev(5, 3, "02:50")))
    writeDrop(drop, "wave1.json", Seq(
      ev(6, 3, "03:00"),
      ev(7, 9, "12:00"))) // watermark pusher closes everything above
    Seq("wave0.json", "wave1.json").zipWithIndex.foreach { case (f, k) =>
      Files.setLastModifiedTime(Paths.get(drop, f),
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + k * 1000L))
    }
    val q = SessionStream.sessionCounts(
        spark.readStream.schema(SessionStream.sessSchema)
          .option("maxFilesPerTrigger", "1").json(drop))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    def m(min: Int) = base + min * 60000L
    assert(got == Set(
      (1L, m(60), m(120), 2L),  // exactly-gap windows touch -> merge
      (2L, m(60), m(119), 2L),  // 29 min merges; end = last + gap
      (3L, m(170), m(210), 2L)  // merged across the two micro-batches
    ), s"sessions diverge: $got")
  }

  test("transformWithState milestones: exactly-once crossings across batches") {
    import graft.streaming.MilestoneStream
    import org.apache.spark.sql.streaming.Trigger
    val drop = tmpDir("ms_drop")
    val out = tmpDir("ms_out")
    val ckpt = tmpDir("ms_ckpt")
    def ev(id: Int, user: Int, min: Int) =
      s"""{"event_id":$id,"user_id":$user,"ts":"2024-01-01T${"%02d".format(min / 60)}:${"%02d".format(min % 60)}:00Z"}"""
    // user 1: 3 events in wave 0, 2 in wave 1 — the 4th-event
    // crossing must fire in batch 1 from carried count=3, and only
    // once; user 2: single event (milestone 1 only).
    writeDrop(drop, "wave0.json", Seq(
      ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 20), ev(10, 2, 15)))
    writeDrop(drop, "wave1.json", Seq(
      ev(4, 1, 30), ev(5, 1, 40)))
    Seq("wave0.json", "wave1.json").zipWithIndex.foreach { case (f, k) =>
      Files.setLastModifiedTime(Paths.get(drop, f),
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + k * 1000L))
    }
    graft.streaming.EventStream.withRocksDbProvider(spark) {
      val q = MilestoneStream.milestones(spark,
          spark.readStream.schema(MilestoneStream.milestoneSchema)
            .option("maxFilesPerTrigger", "1").json(drop))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("milestone_n"),
        r.getAs[Long]("at_ms"))).toSet
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    def m(min: Int) = base + min * 60000L
    assert(got == Set(
      (1L, 1L, m(0)), (1L, 2L, m(10)), (1L, 4L, m(30)),
      (2L, 1L, m(15))), s"milestones diverge: $got")
  }

  test("event-time timers: idle close fires once, merge re-arms the timer") {
    import graft.streaming.IdleCloseStream
    import org.apache.spark.sql.streaming.Trigger
    val drop = tmpDir("idle_drop")
    val out = tmpDir("idle_out")
    val ckpt = tmpDir("idle_ckpt")
    def ev(id: Int, user: Int, typ: String, ts: String) =
      s"""{"event_id":$id,"user_id":$user,"event_type":"$typ","ts":"2024-01-01T$ts:00Z"}"""
    // idle = 2 h, horizon = 600.5 s.
    // user 1: three wave-0 events, last 01:20 -> timer 03:20 fires at
    //   the end of batch 1 (wm = 04:00 - 10:00.5 = 03:49:59.5) — a
    //   MID-STREAM close.
    // user 2: wave-0 event 01:30 (timer 03:30 would fire in batch 1)
    //   but a wave-1 event at 05:00 merges FIRST and re-arms to 07:00
    //   -> closes in the final batch with BOTH events. Pins the
    //   deleteTimer discipline: a stale 03:30 timer would emit a
    //   premature single-event summary.
    // user 4: wave-0 event 04:00 (timer 06:00, fwm-closed).
    // user 9: pusher at 23:00 -> fwm 22:49:59.5; its own timer 25:00
    //   never fires.
    writeDrop(drop, "wave0.json", Seq(
      ev(1, 1, "click", "01:00"), ev(2, 1, "click", "01:10"),
      ev(3, 1, "view", "01:20"),
      ev(4, 2, "click", "01:30"),
      ev(5, 4, "purchase", "04:00")))
    writeDrop(drop, "wave1.json", Seq(
      ev(6, 2, "view", "05:00"),
      ev(7, 9, "click", "23:00")))
    Seq("wave0.json", "wave1.json").zipWithIndex.foreach { case (f, k) =>
      Files.setLastModifiedTime(Paths.get(drop, f),
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + k * 1000L))
    }
    graft.streaming.EventStream.withRocksDbProvider(spark) {
      val q = IdleCloseStream.idleSummaries(spark,
          spark.readStream.schema(IdleCloseStream.idleSchema)
            .option("maxFilesPerTrigger", "1").json(drop))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Long]("last_ms"))).toSet
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    def m(min: Int) = base + min * 60000L
    assert(got == Set(
      (1L, "click", 2L, m(80)), (1L, "view", 1L, m(80)),
      (2L, "click", 1L, m(300)), (2L, "view", 1L, m(300)),
      (4L, "purchase", 1L, m(240))), s"summaries diverge: $got")
  }

  test("transformWithState state survives a query restart from checkpoint") {
    import graft.streaming.MilestoneStream
    import org.apache.spark.sql.streaming.Trigger
    val drop = tmpDir("msr_drop")
    val out = tmpDir("msr_out")
    val ckpt = tmpDir("msr_ckpt")
    def ev(id: Int, user: Int, min: Int) =
      s"""{"event_id":$id,"user_id":$user,"ts":"2024-01-01T${"%02d".format(min / 60)}:${"%02d".format(min % 60)}:00Z"}"""
    def drain(): Unit = {
      val q = MilestoneStream.milestones(spark,
          spark.readStream.schema(MilestoneStream.milestoneSchema)
            .json(drop))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    graft.streaming.EventStream.withRocksDbProvider(spark) {
      // run 1: three events -> milestones 1 and 2; count=3 in state
      writeDrop(drop, "w0.json", Seq(
        ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 20)))
      drain()
      // run 2: a SEPARATE query (same checkpoint) sees one more file;
      // the 4th-event crossing must come from RESTORED count=3 —
      // a lost state store would emit milestone 1 again instead.
      writeDrop(drop, "w1.json", Seq(ev(4, 1, 30), ev(5, 1, 40)))
      drain()
    }
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("milestone_n"), r.getAs[Long]("at_ms")))
      .toSet
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    def m(min: Int) = base + min * 60000L
    assert(got == Set((1L, m(0)), (2L, m(10)), (4L, m(30))),
      s"restart broke milestone state carry: $got")
  }

  test("streaming rolling actives match batch on watermark-closed windows") {
    import graft.streaming.ActiveUsersStream
    import org.apache.spark.sql.functions._
    val drop = tmpDir("wau_drop")
    val out = tmpDir("wau_out")
    val ckpt = tmpDir("wau_ckpt")
    def ev(id: Int, day: Int, user: Int) =
      f"""{"event_id":$id,"ts":"2024-01-$day%02dT12:00:00Z","user_id":$user,"event_type":"click","value":1.0}"""
    writeDrop(drop, "d.json", Seq(
      ev(1, 1, 1), ev(2, 1, 2), // day 1: users 1,2
      ev(3, 1, 1),              // duplicate same-day touch, must dedup
      ev(4, 3, 1),              // day 3: user 1
      ev(5, 9, 3),              // day 9: user 3
      ev(6, 20, 99)))           // day 20: watermark pusher
    ActiveUsersStream.activeUsersAvailableNow(spark, drop, out, ckpt)
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sliding-window semantics: day d counts users active in [d-6, d];
    // append mode emits only windows the day-20 watermark has closed
    val expected =
      (1 to 7).map(d => f"2024-01-$d%02d" -> 2L) ++
        Seq("2024-01-08" -> 1L, "2024-01-09" -> 2L) ++
        (10 to 15).map(d => f"2024-01-$d%02d" -> 1L)
    assert(streamed == expected.toMap,
      s"streamed windows diverge: $streamed")
    // the SAME expression tree over a batch read agrees on every
    // emitted window (batch also sees the not-yet-closed tail)
    val batch = ActiveUsersStream.activeUsers(
        spark.read.schema(EventStream.eventSchema).json(drop))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    streamed.foreach { case (d, n) => assert(batch(d) == n) }
    // and the batch q92 operator agrees on its observed-day spine
    val rolling = graft.operators.Sessionize.rollingActive(
        spark.read.schema(EventStream.eventSchema).json(drop)
          .filter(col("user_id") =!= 99), windowDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("2024-01-01", "2024-01-03", "2024-01-09").foreach { d =>
      assert(rolling(d) == streamed(d),
        s"q92 and the stream disagree on $d")
    }
  }

  test("transformWithState list state: runs detected across the batch boundary") {
    import graft.streaming.RunStream
    import org.apache.spark.sql.streaming.Trigger
    val drop = tmpDir("run_drop")
    val out = tmpDir("run_out")
    val ckpt = tmpDir("run_ckpt")
    def ev(id: Int, user: Int, min: Int, t: String) =
      s"""{"event_id":$id,"user_id":$user,"event_type":"$t","ts":"2024-01-01T${"%02d".format(min / 60)}:${"%02d".format(min % 60)}:00Z"}"""
    // user 1: c c | c c  -> a run STRADDLES the wave boundary (3rd c
    // arrives in batch 1 with both predecessors carried in list
    // state) and the 4th c extends it (overlapping emission);
    // user 2: c v c -> never three alike, must stay silent.
    writeDrop(drop, "wave0.json", Seq(
      ev(1, 1, 0, "c"), ev(2, 1, 10, "c"),
      ev(10, 2, 5, "c"), ev(11, 2, 15, "v")))
    writeDrop(drop, "wave1.json", Seq(
      ev(3, 1, 20, "c"), ev(4, 1, 30, "c"), ev(12, 2, 25, "c")))
    Seq("wave0.json", "wave1.json").zipWithIndex.foreach { case (f, k) =>
      Files.setLastModifiedTime(Paths.get(drop, f),
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + k * 1000L))
    }
    graft.streaming.EventStream.withRocksDbProvider(spark) {
      val q = RunStream.typeRuns(spark,
          spark.readStream.schema(graft.streaming.IdleCloseStream.idleSchema)
            .option("maxFilesPerTrigger", "1").json(drop))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("at_id"))).toSet
    assert(got == Set((1L, "c", 3L), (1L, "c", 4L)),
      s"run hits diverge: $got")
  }
}
