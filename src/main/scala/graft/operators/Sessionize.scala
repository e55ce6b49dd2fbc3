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

  /** q77: event-type transition matrix — counts of consecutive
    * (prev, next) event-type pairs within each user's time-ordered
    * stream (the first-order Markov statistics behind next-action
    * prediction and anomalous-flow detection). Same single user_id
    * shuffle as [[sessionQuery]]: the lag window does the pairing,
    * then a tiny (|types|² rows) aggregation. */
  def transitionsQuery(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(byTime))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  /** DuckDB oracle for [[transitionsQuery]]. */
  def transitionsOracleSql: String =
    """WITH p AS (SELECT user_id,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
         FROM events)
     SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
     FROM p WHERE prev_type IS NOT NULL
     GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q63: sequential funnel — how many users complete each stage of
    * signup → view → click → purchase IN ORDER (each stage's event
    * must occur at or after the previous stage's completion time; a
    * purchase before signup does not count). The classic product-
    * analytics query, and the recurrence (stage N's time depends on
    * stage N-1's) is deliberately solved in ONE groupBy(user_id):
    * each stage collects its sorted event-time array, and the
    * sequential mins are pure array arithmetic on the aggregated row —
    * no per-stage join cascade, no second shuffle. At 100 TB the cost
    * is one keyed shuffle of (user_id, type, ms) triples; the arrays
    * are per-user event counts, bounded by the heaviest user, not the
    * corpus (a per-user event cap upstream is the standard guard).
    *
    * try_element_at: ANSI mode throws on out-of-bounds element_at, and
    * a user missing a stage yields an empty candidate array — the
    * null must propagate, not throw. */
  def funnelQuery(spark: SparkSession, dir: String): DataFrame = {
    val stages = Seq("signup", "view", "click", "purchase")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val stageArrays = stages.map(s => sort_array(collect_list(
      when(col("event_type") === s, col("ms")))).as(s"a_$s"))
    val arrays = ev.groupBy("user_id")
      .agg(stageArrays.head, stageArrays.tail: _*)
    val timed = stages.zipWithIndex.foldLeft(arrays) {
      case (df, (s, 0)) =>
        df.withColumn(s"t_$s", try_element_at(col(s"a_$s"), lit(1)))
      case (df, (s, i)) =>
        val prev = s"t_${stages(i - 1)}"
        df.withColumn(s"t_$s", try_element_at(
          filter(col(s"a_$s"), x => x >= col(prev)), lit(1)))
    }
    val counts = timed.agg(
      count(col(s"t_${stages.head}")).as(stages.head),
      stages.tail.map(s => count(col(s"t_$s")).as(s)): _*)
    counts.select(explode(array(stages.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1L).as("stage"), lit(s).as("step"),
          col(s).as("users"))
      }: _*)).as("r"))
      .select(col("r.stage"), col("r.step"), col("r.users"))
      .orderBy("stage")
  }

  /** DuckDB oracle for [[funnelQuery]] — the same chained
    * sorted-array / filter-first recurrence (stage times in epoch-ms,
    * truncating, identical in both engines for post-1970 data). */
  def funnelOracleSql: String =
    """WITH u AS (SELECT user_id,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'signup')) AS a_signup,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'view')) AS a_view,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'click')) AS a_click,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'purchase')) AS a_purchase
       FROM events GROUP BY 1),
     s1 AS (SELECT *, a_signup[1] AS t_signup FROM u),
     s2 AS (SELECT *, (list_filter(a_view, x -> x >= t_signup))[1] AS t_view FROM s1),
     s3 AS (SELECT *, (list_filter(a_click, x -> x >= t_view))[1] AS t_click FROM s2),
     s4 AS (SELECT *, (list_filter(a_purchase, x -> x >= t_click))[1] AS t_purchase FROM s3),
     c AS (SELECT count(t_signup) AS n1, count(t_view) AS n2,
             count(t_click) AS n3, count(t_purchase) AS n4 FROM s4)
     SELECT stage, step, users FROM (
       SELECT 1::BIGINT AS stage, 'signup' AS step, n1 AS users FROM c
       UNION ALL SELECT 2, 'view', n2 FROM c
       UNION ALL SELECT 3, 'click', n3 FROM c
       UNION ALL SELECT 4, 'purchase', n4 FROM c)
     ORDER BY stage"""
}
