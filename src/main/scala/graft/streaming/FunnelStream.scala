package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming twin of the batch sequential funnel
  * (`operators.Sessionize.funnelQuery`): a per-user state machine over
  * `flatMapGroupsWithState` that records each stage of
  * signup → view → click → purchase the first time it completes IN
  * ORDER (an event only counts if it is at or after the previous
  * stage's completion time — identical semantics to the batch
  * sorted-array recurrence, so the two are testably equivalent).
  *
  * State per user is four optional epoch-ms stamps — constant size, no
  * event buffering — evicted by event-time timeout once the user has
  * either completed the funnel or gone quiet past the watermark. The
  * only shuffle is the keyed grouping on user_id. Within a micro-batch
  * events are sorted before advancing, so any disorder the watermark
  * admits cannot reorder stages; cross-batch disorder is the watermark
  * contract, as in every stateful streaming operator here.
  */
object FunnelStream {

  val stages: Seq[String] = Seq("signup", "view", "click", "purchase")

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Completed-prefix stage times, epoch ms. */
  case class FunnelState(times: Seq[Long])

  /** One newly completed stage for one user. */
  case class StageHit(user_id: Long, stage: Long, step: String, ms: Long)

  /** Pure per-user transition: fold sorted events into the state,
    * emitting a StageHit for each stage newly completed. Exactly the
    * batch recurrence: stage i completes at the first event of its
    * type at or after stage i-1's completion. One documented edge
    * differs: two events at the IDENTICAL timestamp resolve here by
    * (ts, event_id) processing order, while the batch array filter
    * would accept either; equivalence is exact whenever timestamps
    * are distinct (the event stream's microsecond stamps are). */
  def advance(state: FunnelState, events: Seq[Event],
              userId: Long): (Seq[StageHit], FunnelState) = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    var times = state.times
    val hits = Seq.newBuilder[StageHit]
    for (e <- sorted if times.length < stages.length) {
      val next = stages(times.length)
      val t = e.ts.getTime
      if (e.event_type == next && (times.isEmpty || t >= times.last)) {
        times = times :+ t
        hits += StageHit(userId, times.length.toLong, next, t)
      }
    }
    (hits.result(), FunnelState(times))
  }

  /** Streaming funnel over an event stream: appends one row per
    * (user, newly completed stage). State times out and is dropped
    * once the watermark passes the user's last progress + `quietMs`
    * (a full funnel is also dropped immediately — nothing more can
    * complete). */
  def funnelStages(events: Dataset[Event],
                   quietMs: Long = 3600000L): Dataset[StageHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (hits, next) = advance(
              state.getOption.getOrElse(FunnelState(Seq.empty)),
              it.toSeq, userId)
            if (next.times.length == stages.length) state.remove()
            else {
              state.update(next)
              if (next.times.nonEmpty)
                state.setTimeoutTimestamp(next.times.last + quietMs)
            }
            hits.iterator
          }
      }
  }

  /** Drive the funnel over the drop dir into a parquet sink
    * (AvailableNow; durable sink because state recovery rides the
    * checkpoint). */
  def funnelAvailableNow(spark: SparkSession, dropDir: String,
                         outDir: String,
                         checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val events = EventStream.readEventStream(spark, dropDir).as[Event]
    val q = funnelStages(events)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
