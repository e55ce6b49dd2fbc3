package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch sessionization over the event stream: the gap-based session
  * windows every clickstream/telemetry pipeline needs — a session is
  * a maximal run of a user's events where consecutive gaps stay at or
  * under `gapMs` (the streaming twin with the same semantics is
  * `EventSessionizer`, which keys sessions by timeout state instead).
  *
  * Shape: ONE shuffle of events by user_id drives both windows (gap
  * detection and the running session counter share the partitioning
  * and sort), then the per-session aggregation reuses the same
  * clustering — Catalyst plans no second exchange. At 100 TB this is
  * the canonical "one shuffle, then window arithmetic" pattern;
  * per-user data only ever meets on its own partition.
  */
object Sessionize {

  /** Per-session summary: event count, start/end epoch-ms, duration.
    * `session_seq` numbers a user's sessions from 1 in time order. */
  def sessionQuery(spark: SparkSession, dir: String,
                   gapMs: Long = 1800000L): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("t"))
      .withColumn("new_sess",
        when(lag(col("t"), 1).over(byTime).isNull ||
          col("t") - lag(col("t"), 1).over(byTime) > gapMs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(byTime))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min(col("t")).as("start_ms"), max(col("t")).as("end_ms"))
      .select(col("user_id"), col("session_seq").cast("long"),
        col("n_events").cast("long").as("n_events"),
        col("start_ms"), col("end_ms"),
        (col("end_ms") - col("start_ms")).as("duration_ms"))
      .orderBy("user_id", "session_seq")
  }
}
