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
  *
  * Since round 14 every batch also runs snapshot RETENTION
  * ([[UpsertStream.vacuumSnapshots]], keepFrom = batchId − 1) BEFORE
  * its merge, so the kill-after-merge injection point is also a
  * kill-AFTER-VACUUM point: the batch-2 cases crash after v0 was
  * already deleted, and the restart must still replay batch 2 against
  * v1 and converge — the replay-safety proof that retention never
  * vacuums a snapshot an uncommitted batch can read.
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

  private def snapshotIds(root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .map(_.getPath.getName.drop(1).toLong).sorted
  }

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
    if (failAt >= 2)
      // ... and so did the batch's vacuum: v0 is already gone when
      // the crash lands, making the restart a replay-after-vacuum
      assert(!snapshotIds(root).contains(0L),
        s"batch $failAt ran after vacuuming v0; crash state ${snapshotIds(root)}")
    // restart: the same checkpoint replays the uncommitted batch
    // (re-merging rows already in the snapshot), then finishes
    val batches = UpsertStream.drainUpsertWaves(spark, drop, root, ck)
    assert(batches >= 1, "restart must process the replayed batch")
    assert(snapshot(root) == expected(),
      "post-restart snapshot must equal the batch argmax per user")
    // retention holds through the crash: snapshot ids are
    // deterministic in the batch id, so even a replayed drain ends
    // with exactly the live pair
    assert(snapshotIds(root) == Seq(1L, 2L),
      s"post-restart chain must be exactly {v1, v2}: ${snapshotIds(root)}")
  }

  test("kill after batch 0's merge: replay of the initial write converges") {
    killAndRestart(0L)
  }

  test("kill after batch 1's merge: replay of the overwrite merge converges") {
    killAndRestart(1L)
  }

  test("kill after batch 2's vacuum+merge: replay after v0's deletion converges") {
    killAndRestart(2L)
  }

  test("K=3 retention: kill after batch 3's vacuum+merge replays at the new boundary") {
    // four waves under a K=3 window (q285's configuration): batch 3
    // is the first to vacuum (v0), and the kill lands after that
    // vacuum+merge but before the checkpoint commit — the replay must
    // converge against v2 with the chain ending at exactly {v1,v2,v3}
    val drop = UpsertStream.stageUpsertWavesN(spark, sf0001,
      UpsertStream.WavesK)
    val root = tmpDir("upsert_root_k3")
    val ck = tmpDir("upsert_ck_k3")
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      UpsertStream.drainUpsertWaves(spark, drop, root, ck,
        failAfterMergeAt = Some(3L), retain = UpsertStream.RetainK)
    }
    assert(died.getMessage.contains("injected crash") ||
      Option(died.getCause).exists(_.getMessage.contains("injected crash")),
      s"unexpected failure: $died")
    // batch 3's vacuum (keepFrom = 3 - (K-1) = 1) already deleted v0
    // when the crash landed — the restart is a replay-after-vacuum at
    // the K=3 boundary
    assert(!snapshotIds(root).contains(0L),
      s"batch 3 ran after vacuuming v0; crash state ${snapshotIds(root)}")
    assert(UpsertStream.currentSnapshot(spark, root).isDefined)
    val batches = UpsertStream.drainUpsertWaves(spark, drop, root, ck,
      retain = UpsertStream.RetainK)
    assert(batches >= 1, "restart must process the replayed batch")
    assert(snapshot(root) == expected(),
      "post-restart snapshot must equal the batch argmax per user")
    assert(snapshotIds(root) == Seq(1L, 2L, 3L),
      s"post-restart K=3 chain must be exactly {v1,v2,v3}: ${snapshotIds(root)}")
  }

  test("crash-free drain matches the same oracle (control)") {
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    val root = tmpDir("upsert_root_ok")
    val ck = tmpDir("upsert_ck_ok")
    val batches = UpsertStream.drainUpsertWaves(spark, drop, root, ck)
    assert(batches == UpsertStream.Waves)
    assert(snapshot(root) == expected())
    // retention: batch 2's vacuum deleted v0; v1 survives because
    // batch 2 could have replayed against it
    assert(snapshotIds(root) == Seq(1L, 2L),
      s"crash-free chain must be exactly {v1, v2}: ${snapshotIds(root)}")
  }

  /** The CDC log read as (batch, op, user, ver, prev_ver) tuples. */
  private def cdcLog(cdc: String): Set[(Int, String, Long, Long, Long)] =
    UpsertStream.cdcReadBack(spark, cdc).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("CDC log survives a kill between cdc-write+merge and commit") {
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    // control: the crash-free log
    val okRoot = tmpDir("cdc_root_ok"); val okCdc = tmpDir("cdc_ok")
    val okCk = tmpDir("cdc_ck_ok")
    assert(UpsertStream.drainCdcWaves(spark, drop, okRoot, okCdc, okCk) ==
      UpsertStream.Waves)
    val expectedLog = cdcLog(okCdc)
    assert(expectedLog.exists(_._2 == "insert") &&
      expectedLog.exists(_._2 == "update"),
      "fixture must exercise both op classes")
    // every update must carry a real pre-image; every insert the -1 key
    assert(expectedLog.forall(e =>
      if (e._2 == "update") e._5 >= 0 else e._5 == -1L),
      "prev_ver must be the pre-image for updates, -1 for inserts")
    // kill after each batch's cdc-write+merge (for batch 2, after the
    // vacuum too), restart on the same checkpoint: the replayed diff
    // must be bit-identical (the v{b-1} by-number probe), so the
    // final log equals the crash-free one
    for (failAt <- 0L until UpsertStream.Waves.toLong) {
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
      assert(snapshotIds(root) == Seq(1L, 2L),
        s"post-restart chain must be exactly {v1, v2}: ${snapshotIds(root)}")
    }
  }
}
