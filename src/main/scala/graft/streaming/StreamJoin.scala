package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
