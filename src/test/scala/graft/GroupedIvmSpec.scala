package graft

import org.apache.spark.sql.functions._
import graft.streaming.{GroupedIvm, UpsertStream}

/** Unit-level pins for the grouped-IVM retraction algebra (q288's
  * [[GroupedIvm.applyMvBatch]]) on a hand-built CDC log where every
  * interesting transition is staged explicitly:
  *
  *  - an update that MOVES its key between buckets (subtract from the
  *    group it left, add to the group it joined),
  *  - an update WITHIN one bucket (retraction and addition meet in
  *    the same group — net count 0, sum moves),
  *  - a group whose count reaches ZERO (must vanish from the view,
  *    matching the from-scratch GROUP BY's no-empty-groups shape),
  *  - crash-resume: a torn (marker-less) view attempt is invisible to
  *    [[UpsertStream.currentConsumerState]], and replaying the batch
  *    overwrites it idempotently.
  */
class GroupedIvmSpec extends SparkSpec {

  /** Write one hand-built log batch: rows are (op, doc_id, ver,
    * prev_ver). Buckets = ver % 7. */
  private def writeBatch(cdc: String, b: Int,
      rows: Seq[(String, Long, Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("op", "doc_id", "ver", "prev_ver")
      .write.mode("overwrite").parquet(s"$cdc/batch=$b")
  }

  private def mvRows(dir: String): Set[(Long, Long, Long)] =
    spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("retraction algebra: cross-bucket move, in-bucket move, count-to-zero drop") {
    val cdc = tmpDir("ivm_cdc")
    val mvRoot = tmpDir("ivm_mv")
    // batch 0: three inserts -> bucket1 {doc1@1, doc3@8}, bucket2 {doc2@2}
    writeBatch(cdc, 0, Seq(
      ("insert", 1L, 1L, -1L),
      ("insert", 2L, 2L, -1L),
      ("insert", 3L, 8L, -1L)))
    val s0 = GroupedIvm.applyMvBatch(spark, cdc, 0L, None, mvRoot)
    assert(mvRows(s0) == Set((1L, 2L, 9L), (2L, 1L, 2L)))
    // batch 1: doc1 moves bucket 1->3; doc3 moves WITHIN bucket 1
    // (8 -> 15); doc4 inserts into bucket 2
    writeBatch(cdc, 1, Seq(
      ("update", 1L, 3L, 1L),
      ("update", 3L, 15L, 8L),
      ("insert", 4L, 9L, -1L)))
    val s1 = GroupedIvm.applyMvBatch(spark, cdc, 1L, Some(s0), mvRoot)
    assert(mvRows(s1) ==
      Set((1L, 1L, 15L), (2L, 2L, 11L), (3L, 1L, 3L)))
    // batch 2: bucket 2 empties (doc2 -> bucket 0, doc4 -> bucket 3)
    // and must be DROPPED, not carried as a zero row
    writeBatch(cdc, 2, Seq(
      ("update", 2L, 7L, 2L),
      ("update", 4L, 10L, 9L)))
    val s2 = GroupedIvm.applyMvBatch(spark, cdc, 2L, Some(s1), mvRoot)
    assert(mvRows(s2) ==
      Set((0L, 1L, 7L), (1L, 1L, 15L), (3L, 2L, 13L)))
    // the incremental view equals the from-scratch rollup over the log
    val scratch = GroupedIvm.groupedIvmReadBack(spark, cdc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mvRows(s2) == scratch)
    // chain bounded: the K=2 vacuum deleted s0 at batch 2
    assert(UpsertStream.consumerStateCount(spark, mvRoot) == 2)
    assert(UpsertStream.currentConsumerState(spark, mvRoot)
      .map(_._1) == Some(2L))
  }

  test("crash-resume: torn view attempts are invisible, replay is idempotent") {
    val cdc = tmpDir("ivm_crash_cdc")
    val mvRoot = tmpDir("ivm_crash_mv")
    writeBatch(cdc, 0, Seq(("insert", 1L, 1L, -1L), ("insert", 2L, 2L, -1L)))
    writeBatch(cdc, 1, Seq(("update", 1L, 3L, 1L)))
    val s0 = GroupedIvm.applyMvBatch(spark, cdc, 0L, None, mvRoot)
    // a crashed attempt of batch 1: parquet landed, marker didn't
    spark.read.parquet(s0).limit(1).write.mode("overwrite")
      .parquet(s"$mvRoot/s1")
    assert(UpsertStream.currentConsumerState(spark, mvRoot)
      .map(_._1) == Some(0L),
      "a marker-less torn view must be invisible to resume")
    // replay from the disk-derived position overwrites the torn dir
    val st = UpsertStream.currentConsumerState(spark, mvRoot).get
    val s1 = GroupedIvm.applyMvBatch(spark, cdc, 1L, Some(st._2), mvRoot)
    assert(mvRows(s1) == Set((2L, 1L, 2L), (3L, 1L, 3L)))
    assert(UpsertStream.currentConsumerState(spark, mvRoot)
      .map(_._1) == Some(1L))
  }

  test("guard semantics: replay skips, gap fails loudly") {
    val cdc = tmpDir("ivm_guard_cdc")
    val mvRoot = tmpDir("ivm_guard_mv")
    writeBatch(cdc, 0, Seq(("insert", 1L, 1L, -1L)))
    writeBatch(cdc, 1, Seq(("update", 1L, 3L, 1L)))
    GroupedIvm.applyMvBatchGuarded(spark, cdc, 0L, mvRoot)
    GroupedIvm.applyMvBatchGuarded(spark, cdc, 1L, mvRoot)
    val s1 = UpsertStream.currentConsumerState(spark, mvRoot).get._2
    val before = mvRows(s1)
    // an at-least-once REPLAY of batch 1 is a no-op, not a double-fold
    GroupedIvm.applyMvBatchGuarded(spark, cdc, 1L, mvRoot)
    assert(UpsertStream.currentConsumerState(spark, mvRoot)
      .map(_._1) == Some(1L))
    assert(mvRows(UpsertStream.currentConsumerState(spark, mvRoot)
      .get._2) == before, "a replayed batch must not re-fold")
    // a batch GAP can only produce a wrong view -> loud failure
    writeBatch(cdc, 3, Seq(("insert", 9L, 9L, -1L)))
    intercept[IllegalArgumentException] {
      GroupedIvm.applyMvBatchGuarded(spark, cdc, 3L, mvRoot)
    }
    ()
  }

  test("streaming IVM survives a kill between the view commit and the checkpoint (replay skips)") {
    val drop = UpsertStream.stageUpsertWaves(spark, sf0001)
    val root = tmpDir("ivm_kill_root")
    val cdc = tmpDir("ivm_kill_cdc")
    val mvRoot = tmpDir("ivm_kill_mv")
    val ck = tmpDir("ivm_kill_ck")
    val applied = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(failAt: Option[Long]): Long =
      UpsertStream.drainCdcWaves(spark, drop, root, cdc, ck,
        failAfterBatch = failAt,
        afterBatch = { (c, b) =>
          // record what the guard actually FOLDS vs skips
          val pos = UpsertStream.currentConsumerState(spark, mvRoot)
            .map(_._1).getOrElse(-1L)
          if (pos < b) applied += b
          GroupedIvm.applyMvBatchGuarded(spark, c, b, mvRoot)
        })
    // kill AFTER batch 1's view committed, BEFORE its checkpoint: the
    // durable truth is (view s1, checkpoint 1)
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(Some(1L))
    }
    assert(died.getCause.getMessage.contains("injected crash"))
    assert(UpsertStream.currentConsumerState(spark, mvRoot)
      .map(_._1) == Some(1L), "the view committed before the kill")
    assert(applied.toSeq == Seq(0L, 1L))
    // restart: batch 1 REPLAYS (at-least-once) but the guard sees
    // position 1 and skips; batch 2 folds; the view lands the full fold
    drain(None)
    assert(applied.toSeq == Seq(0L, 1L, 2L),
      s"the replayed batch 1 must be skipped, folds ran: $applied")
    val finalDir = UpsertStream.currentConsumerState(spark, mvRoot).get._2
    val scratch = GroupedIvm.groupedIvmReadBack(spark, cdc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mvRows(finalDir) == scratch,
      "post-restart view must equal the from-scratch rollup")
  }
}
