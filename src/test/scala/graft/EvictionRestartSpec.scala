package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.streaming.StreamJoin

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
    // OVERWRITE it, not double it
    assert(spark.read.parquet(s"$out/b=3").count() >= 0)

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
}
