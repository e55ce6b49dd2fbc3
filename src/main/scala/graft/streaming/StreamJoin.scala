package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Watermarked stream-stream join — the correlation operator for two
  * live feeds (the batch twin is the q42 range join): each click is
  * joined to the same user's purchases in the preceding attribution
  * window.
  *
  * Both sides carry event-time watermarks and the join condition
  * bounds purchase time relative to click time, which is what lets
  * Structured Streaming EXPIRE state: a buffered purchase can only
  * match clicks up to `windowMinutes` later, so once the click-side
  * watermark passes `purchase_ts + window` the row is evicted from
  * the state store. Without the time-interval condition the state
  * grows without bound — the condition is a correctness requirement
  * at scale, not an optimization. State is keyed by user_id, so the
  * shuffle and store partition exactly like the batch join would.
  */
object StreamJoin {

  /** Click→purchase attribution join: purchases at or before the
    * click, within `windowMinutes`. Inner join — emit only attributed
    * clicks; results append as both watermarks advance. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                        windowMinutes: Int = 10,
                        watermark: String = "5 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"), col("value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") <= col("click_ts") &&
        col("purchase_ts") >= col("click_ts") -
          expr(s"interval $windowMinutes minutes"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** q229 attribution window; 60 minutes yields a non-trivial match
    * set on the fixture's 30-day event span. */
  val AttributionMinutes = 60

  /** One micro-batch by construction: every drop file fits in the
    * single AvailableNow trigger, so no watermark advance can evict
    * join state between batches and the drained result is COMPLETE —
    * which is exactly what lets a batch oracle check it. (Multi-batch
    * watermark semantics are exercised by StreamingSpec; q218's drain
    * covers the multi-batch stateful family with eviction-safe
    * staging.) */
  val JoinDropFiles = 4
  val JoinFilesPerTrigger = 8

  /** q229: the watermarked STREAM-STREAM interval join driven to a
    * hash-checked answer — clicks and purchases staged as one JSONL
    * drop (epoch-ms longs, exact integer round-trip — the q149
    * discipline), read back as TWO file-source streams over the same
    * drop (each side filters its event type), joined with the
    * time-interval condition that bounds state, drained AvailableNow
    * into a parquet sink, and the landed pairs aggregated per user.
    * Equality with the batch interval join over the raw events
    * certifies the whole path: staging, dual-stream scan, state-store
    * join, sink commit log, read-back, and the cents arithmetic. */
  def streamJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val sunk = graft.sources.Scratch.dirOutliving(spark, "q229_sunk")
    val drop = graft.sources.Scratch.dir(spark, "q229_drop")
    val ck = graft.sources.Scratch.dir(spark, "q229_ck")
    val staged = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), unix_millis(col("ts")).as("t"),
        col("user_id"), col("event_type"), col("value"))
    val dropSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("t", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    staged.repartition(JoinDropFiles).write.mode("overwrite").json(drop)
    try {
      def side(eventType: String): DataFrame = spark.readStream
        .schema(dropSchema)
        .option("maxFilesPerTrigger", JoinFilesPerTrigger.toString)
        .json(drop)
        .filter(col("event_type") === eventType)
        .select(col("event_id"), timestamp_millis(col("t")).as("ts"),
          col("user_id"), col("value"))
      val q = clickPurchaseJoin(side("click"), side("purchase"),
          AttributionMinutes)
        .writeStream.format("parquet").option("path", sunk)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      for (d <- Seq(drop, ck)) graft.sources.Scratch.delete(spark, d)
    }
    spark.read.parquet(sunk)
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        count_distinct(col("click_id")).cast("long").as("n_clicks"),
        graft.operators.OlapOps.decSumCents(col("value"))
          .as("value_cents"))
      .orderBy("user_id")
  }

  /** DuckDB oracle for [[streamJoinQuery]] — the batch interval join
    * over the raw events at the staged ms precision. */
  def streamJoinOracleSql: String =
    s"""WITH c AS (SELECT event_id AS click_id, user_id,
           epoch_ms(ts) AS ct FROM events WHERE event_type = 'click'),
       p AS (SELECT event_id AS purchase_id, user_id,
           epoch_ms(ts) AS pt, value FROM events
         WHERE event_type = 'purchase'),
       j AS (SELECT c.user_id, c.click_id, p.purchase_id, p.value
             FROM c JOIN p ON p.user_id = c.user_id
               AND p.pt <= c.ct
               AND p.pt >= c.ct - ${AttributionMinutes * 60000L})
     SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks,
       CAST(round(sum(CAST(value AS DECIMAL(38,10))), 2) * 100
         AS BIGINT) AS value_cents
     FROM j GROUP BY 1 ORDER BY user_id"""
}
