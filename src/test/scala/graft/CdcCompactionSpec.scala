package graft

import org.apache.spark.sql.functions._
import graft.streaming.UpsertStream

/** Failure injection and boundary cases for CDC log compaction
  * (q280's [[UpsertStream.compactCdcLog]]). The claims under test:
  *
  *  - REPLAY SAFETY: compaction folds strictly below the consumer's
  *    oldest-uncommitted batch, so the batch a crashed consumer
  *    replays is always still on disk.
  *  - CRASH SAFETY: a kill between the base's commit marker and the
  *    partition deletes leaves folded `batch=<id>` dirs on disk; the
  *    `batch > upto` tail filter keeps every reader correct over that
  *    torn state, and re-running the compactor sweeps it — the same
  *    write-new-then-repoint discipline as the snapshot chain's
  *    (UpsertRestartSpec).
  *  - INCREMENTALITY: compacting in two steps (fold batch 0, then
  *    fold batch 1 onto the prior base) equals the one-shot fold —
  *    the path a periodic compactor actually runs.
  */
class CdcCompactionSpec extends SparkSpec {

  /** Drain the shared three-wave CDC feed into fresh dirs; returns the
    * log dir. */
  private def drainLog(tag: String): String = {
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    val root = tmpDir(s"cc_root_$tag")
    val cdc = tmpDir(s"cc_cdc_$tag")
    val ck = tmpDir(s"cc_ck_$tag")
    assert(UpsertStream.drainCdcWaves(spark, drop, root, cdc, ck) ==
      UpsertStream.Waves)
    cdc
  }

  /** The consumer's answer as a comparable map: user -> (ver, n_ops).
    * Computed through the PUBLIC read-back (base-if-present + tail),
    * which is exactly what a consumer resumes from. */
  private def fold(cdc: String): Map[Long, (Long, Long)] =
    UpsertStream.cdcCompactionReadBack(spark, cdc).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("compaction bounds the layout and preserves the fold") {
    val cdc = drainLog("ok")
    val expected = fold(cdc) // full-log fold, no base yet
    assert(expected.nonEmpty)
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 2)
    // replay safety: batch 2 (the consumer's uncommitted batch) must
    // survive; batches 0/1 are folded and gone
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L),
      s"live batches: ${UpsertStream.cdcBatchIds(spark, cdc)}")
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(1L))
    assert(fold(cdc) == expected,
      "compaction must be semantically invisible to the consumer")
    // idempotence: re-running at the same checkpoint changes nothing
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 2)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L))
    assert(fold(cdc) == expected)
  }

  test("kill between base commit and partition deletes: torn reads stay correct, re-run sweeps") {
    val cdc = drainLog("kill")
    val expected = fold(cdc)
    val died = intercept[IllegalStateException] {
      UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 2,
        failBeforeDeletes = true)
    }
    assert(died.getMessage.contains("injected crash"))
    // torn state: the base committed but the folded partitions remain
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(1L),
      "the crash must land AFTER the base commit")
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(0L, 1L, 2L),
      "the crash must land BEFORE the partition deletes")
    // a reader over the torn log must NOT double-count the folded
    // partitions — the batch > upto filter, not the deletes, carries
    // correctness
    assert(fold(cdc) == expected,
      "torn-state read double-counted folded partitions")
    // restart: the re-run is idempotent and finishes the sweep
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 2)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L))
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(1L))
    assert(fold(cdc) == expected)
  }

  test("incremental compaction (two steps) equals the one-shot fold") {
    val cdc = drainLog("inc")
    val expected = fold(cdc)
    // consumer committed batch 0 only
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 1)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(1L, 2L))
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(0L))
    assert(fold(cdc) == expected)
    // ... then batch 1: the second step folds ONTO the prior base
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 2)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L))
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(1L))
    assert(fold(cdc) == expected)
    // folding the whole log leaves a base and no tail; the read-back
    // still answers from the base alone
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 3)
    assert(UpsertStream.cdcBatchIds(spark, cdc).isEmpty)
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(2L))
    assert(fold(cdc) == expected)
    // a checkpoint beyond the newest batch (contract-violating) must
    // not mint a base claiming coverage of unwritten batches — a
    // later batch=3 write would otherwise be silently ignored by the
    // batch > upto tail filter
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 99)
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(2L))
    assert(fold(cdc) == expected)
  }

  test("checkpoint 0 is a no-op (nothing committed, nothing foldable)") {
    val cdc = drainLog("noop")
    val expected = fold(cdc)
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 0)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(0L, 1L, 2L))
    assert(UpsertStream.currentCdcBase(spark, cdc).isEmpty)
    assert(fold(cdc) == expected)
  }

  test("published-checkpoint protocol: unpublished no-op, monotonic max, stale republish ignored") {
    val cdc = drainLog("pub")
    val expected = fold(cdc)
    // no publication -> the stand-alone compactor knows nothing is
    // safe to fold and must not touch the log
    UpsertStream.compactCdcLogAtPublished(spark, cdc)
    assert(UpsertStream.readConsumerCheckpoint(spark, cdc).isEmpty)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(0L, 1L, 2L))
    // publish 2 -> the compactor folds {0,1} from the marker alone
    UpsertStream.publishConsumerCheckpoint(spark, cdc, 2)
    assert(UpsertStream.readConsumerCheckpoint(spark, cdc) == Some(2L))
    UpsertStream.compactCdcLogAtPublished(spark, cdc)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L))
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(1L))
    // a belated replay republishing an OLDER checkpoint (crash-then-
    // replay of the consumer's publish step) leaves two markers; the
    // max read rule ignores the stale one and re-compaction is a no-op
    UpsertStream.publishConsumerCheckpoint(spark, cdc, 1)
    assert(UpsertStream.readConsumerCheckpoint(spark, cdc) == Some(2L),
      "a stale republish moved the published checkpoint backwards")
    UpsertStream.compactCdcLogAtPublished(spark, cdc)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L))
    assert(fold(cdc) == expected)
    // advancing publication sweeps the stale markers and folds the tail
    UpsertStream.publishConsumerCheckpoint(spark, cdc, 3)
    UpsertStream.compactCdcLogAtPublished(spark, cdc)
    assert(UpsertStream.cdcBatchIds(spark, cdc).isEmpty)
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(2L))
    assert(fold(cdc) == expected)
  }

  test("live interleaving: a consumer crash mid-loop replays from a batch the compactor just spared") {
    val cdc = drainLog("live")
    val expected = fold(cdc)
    val stateRoot = tmpDir("cc_live_state")
    // the SHARED consumer fold step (the same code q276/q284 run —
    // mode overwrite is the property a torn replayed write leans on)
    def applyBatch(b: Long, prev: Option[String]): String =
      UpsertStream.applyConsumerBatch(spark, cdc, b, prev, stateRoot)
    // consumer applies batch 0 and COMMITS (checkpoint -> 1); the
    // compactor fires between folds and folds <= 0
    val s0 = applyBatch(0L, None)
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 1)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(1L, 2L))
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(0L))
    // consumer applies batch 1 but CRASHES before committing its
    // checkpoint: the durable truth is still (state s0, checkpoint 1)
    applyBatch(1L, Some(s0))
    // ...the compactor, honoring the DURABLE checkpoint (still 1),
    // runs again mid-crash: it must NOT fold the batch the consumer
    // is about to replay
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 1)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(1L, 2L),
      "the compactor folded the batch the crashed consumer must replay")
    // replay: batch 1 refolds onto s0 (overwriting the torn s1 —
    // idempotent by mode overwrite), then the loop continues with the
    // compactor interleaved at each commit
    val s1 = applyBatch(1L, Some(s0))
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 2)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L))
    val s2 = applyBatch(2L, Some(s1))
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 3)
    // fully folded: the resume path answers from the base alone and
    // still equals the pre-compaction full-log fold
    assert(UpsertStream.cdcBatchIds(spark, cdc).isEmpty)
    assert(UpsertStream.currentCdcBase(spark, cdc).map(_._1) == Some(2L))
    assert(fold(cdc) == expected)
    // and the crashed-then-replayed consumer's own state agrees with
    // the compactor's base on every key's version
    val state = spark.read.parquet(s2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == expected.map { case (k, (v, _)) => k -> v },
      "replayed consumer state diverged from the full-log fold")
  }

  test("consumer state retention: bounded chain, torn attempts invisible, replay converges") {
    val cdc = drainLog("ret")
    val expected = fold(cdc)
    val stateRoot = tmpDir("cc_ret_state")
    // q287's loop shape: position derived from disk each step
    def step(b: Long): String = {
      val st = UpsertStream.currentConsumerState(spark, stateRoot)
      assert(st.map(_._1).getOrElse(-1L) == b - 1)
      UpsertStream.applyConsumerBatch(spark, cdc, b, st.map(_._2),
        stateRoot)
    }
    step(0L); step(1L)
    assert(UpsertStream.consumerStateCount(spark, stateRoot) == 2)
    // CRASH during batch 2, after its vacuum already fired (the
    // earliest crash point inside applyConsumerBatch): s0 is gone,
    // s1 — the replay margin — is intact by the keepFrom ≤ b−1
    // argument, and the durable position is still s1
    UpsertStream.vacuumConsumerStates(spark, stateRoot, keepFrom = 1L)
    assert(UpsertStream.consumerStateCount(spark, stateRoot) == 1)
    assert(UpsertStream.currentConsumerState(spark, stateRoot)
      .map(_._1) == Some(1L))
    // ...or after the parquet landed but BEFORE the commit marker: a
    // torn s2 exists on disk yet the resume protocol cannot see it
    val s1 = UpsertStream.currentConsumerState(spark, stateRoot).get._2
    spark.read.parquet(s1).limit(1).write.mode("overwrite")
      .parquet(s"$stateRoot/s2")
    assert(UpsertStream.consumerStateCount(spark, stateRoot) == 2,
      "the torn attempt IS on disk (storage observable)")
    assert(UpsertStream.currentConsumerState(spark, stateRoot)
      .map(_._1) == Some(1L),
      "a marker-less torn state must be invisible to resume")
    // replay batch 2 from the disk-derived position: mode overwrite
    // clears the torn s2, the chain stays bounded, the answer lands
    val s2 = step(2L)
    assert(UpsertStream.currentConsumerState(spark, stateRoot)
      .map(_._1) == Some(2L))
    assert(UpsertStream.consumerStateCount(spark, stateRoot) == 2,
      "the retain=2 window must hold exactly {s1, s2}")
    val state = spark.read.parquet(s2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == expected.map { case (k, (v, _)) => k -> v },
      "replayed bounded-chain consumer diverged from the full-log fold")
  }

  test("malformed names degrade to ignored, never a crash") {
    val cdc = drainLog("mal")
    val expected = fold(cdc)
    val fs = new org.apache.hadoop.fs.Path(cdc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a torn/foreign artifact in _consumer whose name parses as no
    // long must not abort the stand-alone compactor (ADVICE r16)
    UpsertStream.publishConsumerCheckpoint(spark, cdc, 2)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$cdc/_consumer/committed=torn.tmp"), true).close()
    assert(UpsertStream.readConsumerCheckpoint(spark, cdc) == Some(2L))
    UpsertStream.compactCdcLogAtPublished(spark, cdc)
    assert(UpsertStream.cdcBatchIds(spark, cdc) == Seq(2L))
    assert(fold(cdc) == expected)
    // stray non-numeric dirs in a table root / state root are ignored
    // by every lister instead of throwing NumberFormatException
    val root = tmpDir("cc_mal_root")
    spark.range(1).write.parquet(s"$root/vjunk")
    fs.create(new org.apache.hadoop.fs.Path(
      s"$root/vjunk/_GRAFT_COMMIT"), true).close()
    assert(UpsertStream.currentSnapshot(spark, root).isEmpty)
    assert(UpsertStream.snapshotCount(spark, root) == 0)
    UpsertStream.vacuumSnapshots(spark, root, keepFrom = 99L)
    assert(UpsertStream.currentConsumerState(spark, root).isEmpty)
  }

  test("the fold matches the from-scratch windowed reconstruction (q276's identity)") {
    val cdc = drainLog("ident")
    val viaWindow = UpsertStream.cdcConsumerReadBack(spark, cdc).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fold(cdc) == viaWindow)
    UpsertStream.compactCdcLog(spark, cdc, oldestUncommitted = 2)
    assert(fold(cdc) == viaWindow)
  }
}
