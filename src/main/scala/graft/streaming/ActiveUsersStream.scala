package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming rolling distinct actives — the streaming twin of the
  * batch WAU curve (`Sessionize.rollingActive`, q92).
  *
  * Batch counts distinct users per 7-day window by exploding (user,
  * day) pairs; a stream cannot re-scan, so the idiomatic shape is two
  * chained stateful operators (Spark 3.5+ supports this combination):
  *
  *   1. `dropDuplicates(window, user)` — first touch per user per
  *      sliding window. State holds one entry per ACTIVE (window,
  *      user) inside the watermark horizon and is evicted as event
  *      time advances past each window — bounded by arrival-rate ×
  *      horizon × (windowDays slides), never by history length.
  *   2. windowed `count` — the per-window distinct total, emitted in
  *      append mode once the watermark closes the window.
  *
  * The sliding `window(ts, '7 days', '1 day')` generates the same ≤ 7
  * windows per event the batch explode materializes — the expand
  * shape, computed incrementally. Windows only FINALIZE (append-mode
  * emit) once the watermark passes their end, so a run over a bounded
  * drop emits exactly the windows ending at or before max(ts) -
  * horizon; the tail stays in state for the next trigger — asserted,
  * not worked around, in the equivalence spec.
  */
object ActiveUsersStream {

  /** Per-sliding-window distinct user counts over a watermarked event
    * stream. `day` is the last day each 7-day window covers (window
    * end is exclusive). Works identically on a batch frame (same
    * expression tree, no watermark semantics) — the equivalence the
    * spec asserts. */
  def activeUsers(events: DataFrame, windowDays: Int = 7,
      horizon: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .select(window(col("ts"), s"$windowDays days", "1 day").as("w"),
        col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy("w")
      .agg(count(lit(1)).as("active_users"))
      .select(
        date_format(date_sub(col("w.end").cast("date"), 1), "yyyy-MM-dd")
          .as("day"),
        col("active_users"))

  /** Drive [[activeUsers]] over a drop directory with AvailableNow to
    * a parquet sink; returns after the run completes. */
  def activeUsersAvailableNow(spark: org.apache.spark.sql.SparkSession,
      dropDir: String, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val q = activeUsers(EventStream.readEventStream(spark, dropDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
