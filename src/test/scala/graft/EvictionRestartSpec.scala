package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.expressions.Window
import graft.streaming.{SessionStream, StreamJoin}

/** Failure injection for the multi-batch eviction join (q273's drain
  * shape): kill the drain mid-stream AFTER a batch's sink write but
  * BEFORE its checkpoint commit, restart on the same checkpoint, and
  * require (a) the crashed batch REPLAYS, (b) the join's state store
  * is RESTORED from the checkpoint — the replayed batch must see more
  * resident state rows than its own input, i.e. the pre-crash buffer
  * tail came back — and (c) the final output equals the complete
  * batch interval join exactly once (the replayed batch's directory
  * is overwritten, not appended). Without state restoration the
  * watermark bookkeeping and any cross-batch pair would silently
  * vanish; this is the fault-tolerance half of the q273 eviction
  * claim, the same discipline UpsertRestartSpec applies to the
  * foreachBatch upsert sink. */
class EvictionRestartSpec extends SparkSpec {

  private val dropSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("t", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def side(spark: SparkSession, drop: String,
      eventType: String): DataFrame = spark.readStream
    .schema(dropSchema)
    .option("maxFilesPerTrigger", "1")
    .json(drop)
    .filter(col("event_type") === eventType)
    .select(col("event_id"), timestamp_millis(col("t")).as("ts"),
      col("user_id"), col("value"))

  /** Drain the eviction join to per-batch parquet directories
    * (`out/b=<id>`, overwrite — idempotent under replay), optionally
    * crashing after `failAt`'s write lands but before its commit.
    * Returns the drain's progress events. */
  private def drain(drop: String, out: String, ck: String,
      failAt: Option[Long])
      : Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
    val q = StreamJoin.clickPurchaseJoin(
        side(spark, drop, "click"), side(spark, drop, "purchase"),
        StreamJoin.AttributionMinutes,
        s"${StreamJoin.EvictDelayMs} milliseconds")
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$out/b=$id")
        if (failAt.contains(id))
          throw new RuntimeException(
            s"injected crash after batch $id sink write")
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress
  }

  test("kill after batch 3's write: state restores, replay converges exactly once") {
    val drop = StreamJoin.stageJoinWaves(spark, sf0001)
    val out = tmpDir("evict_out")
    val ck = tmpDir("evict_ck")

    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(drop, out, ck, failAt = Some(3L))
    }
    assert(died.getMessage.contains("injected crash") ||
      Option(died.getCause).exists(_.getMessage.contains("injected crash")),
      s"unexpected failure: $died")
    // batch 3's output landed before the crash — the restart must
    // OVERWRITE it, not double it. Asserted on the write itself (the
    // directory exists and holds part files), not on join-output row
    // count: an empty-but-valid batch-3 result would still prove the
    // pre-crash write happened, and must not fail spuriously.
    val b3 = new org.apache.hadoop.fs.Path(s"$out/b=3")
    val fs = b3.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(b3) && fs.listStatus(b3)
        .exists(_.getPath.getName.startsWith("part-")),
      "batch 3's sink write must land before the injected crash")

    val progress = drain(drop, out, ck, failAt = None)
    val inputBatches = progress.filter(_.numInputRows > 0).sortBy(_.batchId)
    // the crashed batch replays, then the remaining waves drain
    assert(inputBatches.map(_.batchId).startsWith(Seq(3L)),
      s"restart must replay batch 3 first: ${inputBatches.map(_.batchId).toSeq}")
    assert(inputBatches.length == 3,
      s"restart must stream batches 3,4,5: ${inputBatches.map(_.batchId).toSeq}")
    // state restoration, observed directly: the replayed batch's
    // resident state must exceed its own input — the pre-crash buffer
    // tail (rows batches 0-2 left in the interval window) came back
    // from the checkpoint. A lost store would hold at most the
    // replayed batch's own rows.
    val replay = inputBatches.head
    val resident = replay.stateOperators.map(_.numRowsTotal).sum
    assert(resident > replay.numInputRows,
      s"replayed batch 3 sees $resident state rows for " +
        s"${replay.numInputRows} inputs — pre-crash state was not restored")

    // exactly-once convergence: the landed pairs equal the complete
    // batch interval join over the staged feed (q273's completeness
    // argument), with no duplicates from the replayed batch
    val staged = spark.read.schema(dropSchema).json(drop)
    val c = staged.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("t").as("ct"))
    val p = staged.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("t").as("pt"))
    val ref = c.join(p,
        col("user_id") === col("p_user_id") &&
          col("pt") <= col("ct") &&
          col("pt") >= col("ct") -
            lit(StreamJoin.AttributionMinutes * 60000L))
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = spark.read.parquet(out)
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == ref.length,
      s"exactly-once violated: landed ${got.length} pairs, " +
        s"batch join yields ${ref.length}")
    assert(got.toSet == ref.toSet,
      "post-restart pairs must equal the batch interval join")
  }

  // ------------------------------------------------------------------
  // The CHAINED pipeline (q279's shape): TWO state stores — the join
  // buffer and the window store — restoring from ONE checkpoint, the
  // SPARK-42376 multi-stateful-operator recovery case users actually
  // hit. Kill after batch 3's sink write; the restart must replay
  // batch 3 with BOTH stores restored and converge to the batch
  // answer exactly once.
  // ------------------------------------------------------------------

  /** Drain the chained join→hourly-window pipeline to per-batch
    * parquet dirs (`out/b=<id>`, overwrite — idempotent under
    * replay), optionally crashing after `failAt`'s write. */
  private def drainChained(drop: String, out: String, ck: String,
      failAt: Option[Long])
      : Array[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
    val q = StreamJoin.clickPurchaseJoin(
        side(spark, drop, "click"), side(spark, drop, "purchase"),
        StreamJoin.AttributionMinutes,
        s"${StreamJoin.LeftJoinHorizonMs} milliseconds")
      .groupBy(window(col("click_ts"), "3600 seconds"))
      .agg(count(lit(1)).cast("long").as("n_pairs"))
      .select(unix_millis(col("window.start")).as("window_ms"),
        col("n_pairs"))
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$out/b=$id")
        if (failAt.contains(id))
          throw new RuntimeException(
            s"injected crash after batch $id sink write")
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress
  }

  test("chained join->window: kill after batch 3, BOTH stores restore, exactly-once windows") {
    chainedKillRestart("chain")
  }

  /** The same two-store kill/restart on ROCKSDB: recovery there goes
    * through changelog/snapshot replay rather than the default
    * provider's HDFS delta files — a different restore path entirely,
    * and the one the 100 TB posture depends on. No other spec proves
    * RocksDB state SURVIVES a crash (q246/q271/q275/q281/q282 drain
    * crash-free); this one does, at the hardest member (two chained
    * stores, one checkpoint). */
  test("chained join->window on RocksDB: kill after batch 3, changelog restore, exactly-once") {
    graft.streaming.EventStream.withRocksDbProvider(spark) {
      chainedKillRestart("chain_rocks")
    }
  }

  /** ... and with CHANGELOG CHECKPOINTING on — the RocksDB mode a
    * large-state deployment runs (per-batch uploads are the changelog
    * delta, not a full snapshot), whose RESTORE path is snapshot +
    * changelog REPLAY. The drain asserts the mode was actually active
    * (at least one `.changelog` file under the state checkpoint —
    * a silently-ignored conf would otherwise pass as a duplicate of
    * the plain RocksDB case). */
  test("chained join->window on RocksDB + changelog checkpointing: kill, replay restore") {
    val key = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    val prior = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      graft.streaming.EventStream.withRocksDbProvider(spark) {
        val ck = chainedKillRestart("chain_rocks_cl")
        val ckFs = new org.apache.hadoop.fs.Path(ck)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = ckFs.listFiles(new org.apache.hadoop.fs.Path(ck), true)
        var sawChangelog = false
        while (it.hasNext && !sawChangelog)
          sawChangelog = it.next().getPath.getName.endsWith(".changelog")
        assert(sawChangelog,
          "no .changelog file under the checkpoint — changelog " +
            "checkpointing was not active, the case proved nothing new")
      }
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Runs the kill/restart/converge cycle; returns the checkpoint
    * dir for provider-specific layout assertions. */
  private def chainedKillRestart(tag: String): String = {
    val drop = StreamJoin.stageOuterJoinWaves(spark, sf0001)
    val out = tmpDir(s"${tag}_out")
    val ck = tmpDir(s"${tag}_ck")

    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainChained(drop, out, ck, failAt = Some(3L))
    }
    assert(died.getMessage.contains("injected crash") ||
      Option(died.getCause).exists(_.getMessage.contains("injected crash")),
      s"unexpected failure: $died")

    val progress = drainChained(drop, out, ck, failAt = None)
    val inputBatches = progress.filter(_.numInputRows > 0).sortBy(_.batchId)
    assert(inputBatches.map(_.batchId).toSeq == Seq(3L, 4L, 5L),
      s"restart must replay batch 3 then finish: ${inputBatches.map(_.batchId).toSeq}")
    // BOTH stores came back from the one checkpoint: the replayed
    // batch reports two state operators, and their summed resident
    // rows exceed its own input — the pre-crash join-buffer tail and
    // the open hourly windows batches 0-2 accumulated were restored,
    // not rebuilt from the replayed wave alone.
    val replay = inputBatches.head
    assert(replay.stateOperators.length == 2,
      s"chained pipeline must report 2 state operators, " +
        s"saw ${replay.stateOperators.length}")
    val resident = replay.stateOperators.map(_.numRowsTotal).sum
    assert(resident > replay.numInputRows,
      s"replayed batch 3 sees $resident state rows for " +
        s"${replay.numInputRows} inputs — pre-crash state was not restored")

    // exactly-once convergence: the landed closed windows equal the
    // batch join bucketed hourly, windows closed by the final
    // min-policy watermark (q252's oracle, computed Spark-side)
    val staged = spark.read.schema(dropSchema).json(drop)
    val c = staged.filter(col("event_type") === "click")
      .select(col("user_id"), col("t").as("ct"))
    val p = staged.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("t").as("pt"))
    val fwm = math.min(
        c.agg(max("ct")).head.getLong(0),
        p.agg(max("pt")).head.getLong(0)) -
      StreamJoin.LeftJoinHorizonMs
    val winMs = StreamJoin.AttributionMinutes * 60000L
    // MULTISET comparison (sorted Seq, not Map/Set): a window
    // re-emitted by a replay bug would otherwise collapse into one
    // entry and pass — duplicates are exactly what exactly-once
    // forbids
    val ref = c.join(p,
        col("user_id") === col("p_user_id") &&
          col("pt") <= col("ct") && col("pt") >= col("ct") - lit(winMs))
      .select((col("ct") - (col("ct") % 3600000L)).as("window_ms"))
      .filter(col("window_ms") + 3600000L <= fwm)
      .groupBy("window_ms").agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = spark.read.parquet(out)
      .select(col("window_ms"), col("n_pairs"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == ref,
      s"post-restart closed windows must equal the batch oracle " +
        s"(got ${got.size} windows, expected ${ref.size})")
    ck
  }

  // ------------------------------------------------------------------
  // The SESSION store (q278's shape): merge-state recovery. A session
  // open across the crash boundary must come back from the checkpoint
  // and keep MERGING — a lost store would restart it and split every
  // boundary-spanning session, which the final equality would catch.
  // ------------------------------------------------------------------

  /** Drain the session aggregate to per-batch parquet dirs,
    * optionally crashing after `failAt`'s write. */
  private def drainSessions(drop: String, out: String, ck: String,
      failAt: Option[Long]): Unit = {
    val q = SessionStream.sessionCounts(
        spark.readStream.schema(SessionStream.sessSchema)
          .option("maxFilesPerTrigger", "1").json(drop))
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$out/b=$id")
        if (failAt.contains(id))
          throw new RuntimeException(
            s"injected crash after batch $id sink write")
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("session store: kill after batch 3, merge-state restores, sessions never split") {
    val drop = SessionStream.stageSessionWaves(spark, sf0001)
    val out = tmpDir("sess_out")
    val ck = tmpDir("sess_ck")

    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainSessions(drop, out, ck, failAt = Some(3L))
    }
    assert(died.getMessage.contains("injected crash") ||
      Option(died.getCause).exists(_.getMessage.contains("injected crash")),
      s"unexpected failure: $died")
    drainSessions(drop, out, ck, failAt = None)

    // the batch answer: THE shared gap rule (Sessionize.sessionsFromMs
    // — the one definition q46/q149/q164 already use, so this
    // reference cannot diverge from the engine's inclusive-gap
    // semantics), end = last + gap, emitted iff closed by the final
    // watermark. Multiset (sorted Seq) comparison: a session row
    // duplicated by a replay bug must fail, not collapse into a set.
    val gap = SessionStream.SessGapMs
    val ev = spark.read.schema(SessionStream.sessSchema).json(drop)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("t"))
    val fwm = ev.agg(max("t")).head.getLong(0) -
      SessionStream.SessHorizonMs
    val ref = graft.operators.Sessionize.sessionsFromMs(ev, gap)
      .filter(col("end_ms") + gap <= fwm)
      .select(col("user_id"), col("start_ms"),
        (col("end_ms") + gap).as("sess_end_ms"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val got = spark.read.parquet(out)
      .select("user_id", "sess_start_ms", "sess_end_ms", "n")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == ref,
      s"post-restart sessions must equal the batch sessionization " +
        s"(got ${got.size}, expected ${ref.size})")

    // ... and the equality actually exercised cross-crash merging:
    // at least one emitted session STARTS before the replayed wave's
    // first event and ENDS (last event, = end - gap) at or after it —
    // a session held open in the restored store and extended by
    // post-restart batches. A lost store would have split it.
    val minT3 = ev
      .withColumn("wave", (ntile(SessionStream.SessEvictWaves).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("t"), col("event_id"))) - 1))
      .filter(col("wave") === 3)
      .agg(min("t")).head.getLong(0)
    assert(got.exists(s => s._2 < minT3 && (s._3 - gap) >= minT3),
      "no emitted session spans the crash boundary — the merge-state " +
        "restoration claim was not exercised")
  }

  /** Provider PARITY for the interval-join eviction members: q277's
    * full-outer drain (BOTH sides' buffers, both null-completion
    * closures — the member whose eviction mechanics subsume the
    * inner/left single-direction cases) run on the default provider
    * and on RocksDB, the drain-side live assertions (wave count, peak
    * bound, mid-drain shed) firing both times, answers compared
    * row-for-row. With q281 (chained join→window) and q286 (session
    * store) this puts RocksDB evidence on every eviction state
    * layout the family uses. */
  test("full-outer eviction drain on RocksDB matches the default provider") {
    def run(): Set[Vector[Any]] =
      StreamJoin.evictionFullJoinQuery(spark, sf0001)
        .collect().map(_.toSeq.toVector).toSet
    val default = run()
    assert(default.nonEmpty)
    val rocks =
      graft.streaming.EventStream.withRocksDbProvider(spark)(run())
    assert(rocks == default,
      "RocksDB full-outer drain diverged from the default provider")
  }
}
