package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, EventTtlStream, StatePartitions}

/** Hand-placed fixture for the event-time TTL processor (q282): pins
  * the lazy-expiry classification, the re-arm/dis-arm discipline, and
  * timer-driven physical reclamation on exact numbers, plus the
  * infinite-TTL CONTRAST arm (every cold must then come from absence
  * and nothing is ever reclaimed) — the q275 NONE-TTL discipline
  * applied to the watermark-driven variant. */
class EventTtlSpec extends SparkSpec {

  private val B = 1700000000000L // whole-second base (.000 ms)
  private def day(d: Double): Long = B + (d * 86400000L).toLong

  /** Two waves: wave-0 max at day 15 sets the batch-1 watermark
    * w0 = day(15) − 600500; the final watermark is day(20) − 600500. */
  private def stageFixture(): String = {
    val drop = tmpDir("ettl_drop")
    val rows = Seq(
      // (event_id, user_id, ms, wave)
      (1L, 1L, day(0), 0),    // u1: expires long before batch 1
      (2L, 2L, day(14), 0),   // u2: still inside TTL at w0 (margin 600.5s)
      (3L, 4L, B + 1000L, 0), // u4: two same-batch arrivals -> cold+warm
      (4L, 4L, B + 2000L, 0),
      (5L, 5L, day(15), 0),   // u5: sets wave-0 max
      (6L, 1L, day(20), 1),   // u1 re-arrives: COLD (expired)
      (7L, 2L, day(15.2), 1), // u2 re-arrives: WARM (alive at w0)
      (8L, 3L, day(16), 1))   // u3: cold by absence
    val staged = spark.createDataFrame(rows)
      .toDF("event_id", "user_id", "ms", "wave")
      .select(col("event_id"), col("user_id"),
        timestamp_millis(col("ms")).as("ts"), col("wave"))
    EventStream.stageWaveFiles(spark, staged,
      Seq("event_id", "user_id", "ts"), 2, drop)
    drop
  }

  /** Drain the fixture at the given TTL; returns (per-user totals,
    * resident state rows after the final batch). */
  private def drain(drop: String, ttlMs: Long)
      : (Map[Long, (Long, Long)], Long) = {
    val sunk = tmpDir(s"ettl_sunk_$ttlMs")
    val ck = tmpDir(s"ettl_ck_$ttlMs")
    var resident = -1L
    StatePartitions.scoped(spark) {
      EventStream.withRocksDbProvider(spark) {
        val q = EventTtlStream.ttlSplits(spark,
            spark.readStream.schema(EventTtlStream.ttlSchema)
              .option("maxFilesPerTrigger", "1").json(drop), ttlMs)
          .writeStream.format("parquet").option("path", sunk)
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        assert(q.recentProgress.count(_.numInputRows > 0) == 2)
        resident = q.recentProgress.last
          .stateOperators.map(_.numRowsTotal).sum
      }
    }
    val totals = EventTtlStream.readBack(spark, sunk).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (totals, resident)
  }

  test("1-day TTL: expiry cold, absence cold, same-batch warm, exact reclamation") {
    val (totals, resident) = drain(stageFixture(), 86400000L)
    assert(totals == Map(
      1L -> ((2L, 0L)), // cold at day 0, cold again at day 20 (expired)
      2L -> ((1L, 1L)), // alive at w0: the re-arrival is warm
      3L -> ((1L, 0L)), // absence cold
      4L -> ((1L, 1L)), // same-batch follow-up warm
      5L -> ((1L, 0L))),
      s"classification diverged: $totals")
    // only u1 (last = day 20) is inside its TTL at the final
    // watermark (day 20 - 600.5s); all other entries were reclaimed
    // by their timers
    assert(resident == 1L,
      s"expected exactly u1 resident, saw $resident state rows")
  }

  test("kill after batch 1: value state AND armed timers restore from the checkpoint") {
    // foreachBatch drain so the crash can land after batch 1's write
    // but before its commit: the restart replays batch 1 against the
    // state checkpointed at batch 0 — including the TIMERS batch 0
    // armed, which is the recovery property no crash-free drain can
    // show (a lost timer registry would never fire expiry for users
    // that don't re-arrive, leaving their entries resident forever).
    val drop = stageFixture()
    val out = tmpDir("ettl_kill_out")
    val ck = tmpDir("ettl_kill_ck")
    def drain(failAt: Option[Long]): Long = {
      var resident = -1L
      StatePartitions.scoped(spark) {
        EventStream.withRocksDbProvider(spark) {
          val q = EventTtlStream.ttlSplits(spark,
              spark.readStream.schema(EventTtlStream.ttlSchema)
                .option("maxFilesPerTrigger", "1").json(drop), 86400000L)
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
          resident = q.recentProgress.last
            .stateOperators.map(_.numRowsTotal).sum
        }
      }
      resident
    }
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(failAt = Some(1L))
    }
    assert(died.getMessage.contains("injected crash") ||
      Option(died.getCause).exists(_.getMessage.contains("injected crash")))
    val resident = drain(failAt = None)
    // classification converges to the crash-free answer: the replayed
    // batch 1 saw u1's RESTORED lastSeen (cold by lazy expiry, not by
    // absence) and u2's (warm) — a lost value state would make u2
    // cold-by-absence and break the map equality
    val totals = EventTtlStream.readBack(spark, out).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(totals == Map(
      1L -> ((2L, 0L)), 2L -> ((1L, 1L)), 3L -> ((1L, 0L)),
      4L -> ((1L, 1L)), 5L -> ((1L, 0L))),
      s"post-restart classification diverged: $totals")
    // ... and the timers armed before the crash fired after it: every
    // entry but u1's was physically reclaimed
    assert(resident == 1L,
      s"expected exactly u1 resident after restart, saw $resident — " +
        "armed timers did not survive the checkpoint")
  }

  test("infinite-TTL contrast: cold only by absence, nothing reclaimed") {
    val (totals, resident) = drain(stageFixture(), 86400000000L)
    assert(totals == Map(
      1L -> ((1L, 1L)), // the day-20 re-arrival is now WARM
      2L -> ((1L, 1L)),
      3L -> ((1L, 0L)),
      4L -> ((1L, 1L)),
      5L -> ((1L, 0L))),
      s"contrast-arm classification diverged: $totals")
    assert(resident == 5L,
      s"no entry may be reclaimed under an infinite TTL, saw $resident")
  }
}
