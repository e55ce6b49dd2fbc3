package graft

import org.apache.spark.sql.functions._
import graft.streaming.UpsertStream

/** Failure injection for the q253 upsert sink. foreachBatch is
  * AT-LEAST-ONCE: a crash after a batch's merge completed but before
  * its checkpoint commit replays that batch on restart, so the merge
  * itself must be idempotent under replay or the "exactly-once table"
  * claim is false. Each case kills the drain at the worst-case point
  * (merge done, commit missing), restarts a NEW query instance on the
  * SAME checkpoint, and proves the final snapshot equals the batch
  * argmax oracle — the same equality q253's DuckDB oracle certifies
  * for the crash-free drain.
  */
class UpsertRestartSpec extends SparkSpec {

  /** Batch argmax per user over the raw events — q253's oracle,
    * computed Spark-side for the assert. */
  private def expected(): Map[Long, (String, Long)] =
    graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(max(struct(col("event_id"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type"), col("m.event_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  private def snapshot(root: String): Map[Long, (String, Long)] =
    UpsertStream.readTable(spark, root)
      .select(col("doc_id").cast("long"), col("text"),
        unix_millis(col("ts")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  private def killAndRestart(failAt: Long): Unit = {
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    val root = tmpDir(s"upsert_root_$failAt")
    val ck = tmpDir(s"upsert_ck_$failAt")
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      UpsertStream.drainUpsertWaves(spark, drop, root, ck,
        failAfterMergeAt = Some(failAt))
    }
    assert(died.getMessage.contains("injected crash") ||
      Option(died.getCause).exists(_.getMessage.contains("injected crash")),
      s"unexpected failure: $died")
    // the merge up to failAt COMPLETED before the crash — a snapshot
    // exists, but the checkpoint never committed the batch
    assert(UpsertStream.currentSnapshot(spark, root).isDefined,
      "the injected crash must land AFTER the merge, not before")
    // restart: the same checkpoint replays the uncommitted batch
    // (re-merging rows already in the snapshot), then finishes
    val batches = UpsertStream.drainUpsertWaves(spark, drop, root, ck)
    assert(batches >= 1, "restart must process the replayed batch")
    assert(snapshot(root) == expected(),
      "post-restart snapshot must equal the batch argmax per user")
  }

  test("kill after batch 0's merge: replay of the initial write converges") {
    killAndRestart(0L)
  }

  test("kill after batch 1's merge: replay of the overwrite merge converges") {
    killAndRestart(1L)
  }

  test("crash-free drain matches the same oracle (control)") {
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    val root = tmpDir("upsert_root_ok")
    val ck = tmpDir("upsert_ck_ok")
    val batches = UpsertStream.drainUpsertWaves(spark, drop, root, ck)
    assert(batches == 2)
    assert(snapshot(root) == expected())
  }

  /** The CDC log read as (batch, op, user, ver) tuples. */
  private def cdcLog(cdc: String): Set[(Int, String, Long, Long)] =
    UpsertStream.cdcReadBack(spark, cdc).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet

  test("CDC log survives a kill between cdc-write+merge and commit") {
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    // control: the crash-free log
    val okRoot = tmpDir("cdc_root_ok"); val okCdc = tmpDir("cdc_ok")
    val okCk = tmpDir("cdc_ck_ok")
    assert(UpsertStream.drainCdcWaves(spark, drop, okRoot, okCdc, okCk) == 2)
    val expectedLog = cdcLog(okCdc)
    assert(expectedLog.exists(_._2 == "insert") &&
      expectedLog.exists(_._2 == "update"),
      "fixture must exercise both op classes")
    // kill after each batch's cdc-write+merge, restart on the same
    // checkpoint: the replayed diff must be bit-identical (the v{b-1}
    // by-number probe), so the final log equals the crash-free one
    for (failAt <- Seq(0L, 1L)) {
      val root = tmpDir(s"cdc_root_$failAt")
      val cdc = tmpDir(s"cdc_log_$failAt")
      val ck = tmpDir(s"cdc_ck_$failAt")
      val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        UpsertStream.drainCdcWaves(spark, drop, root, cdc, ck,
          failAfterBatch = Some(failAt))
      }
      assert(died.getMessage.contains("injected crash") ||
        Option(died.getCause).exists(_.getMessage.contains("injected crash")))
      UpsertStream.drainCdcWaves(spark, drop, root, cdc, ck)
      assert(cdcLog(cdc) == expectedLog,
        s"replayed CDC log diverged after kill at batch $failAt")
      // and the table itself still converges (q253's claim holds
      // through the CDC-writing drain too)
      assert(snapshot(root) == expected())
    }
  }
}
