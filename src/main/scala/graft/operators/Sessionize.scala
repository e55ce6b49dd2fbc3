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
                   gapMs: Long = 1800000L): DataFrame =
    sessionsFromMs(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("t")), gapMs)

  /** THE gap-rule session numbering — adds `new_sess` and
    * `session_seq` to any (user_id, event_id, t) frame. One
    * definition shared by q46/q149 ([[sessionsFromMs]]) and the
    * q164/q165 attribution pair, so a change to the rule (gap
    * semantics, tie-break) cannot diverge them. */
  private def withSessionSeq(ev: DataFrame, gapMs: Long): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
    ev
      .withColumn("new_sess",
        when(lag(col("t"), 1).over(byTime).isNull ||
          col("t") - lag(col("t"), 1).over(byTime) > gapMs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(byTime))
  }

  /** [[sessionQuery]] over an explicit (user_id, event_id, t) frame
    * with epoch-ms times — the core the streaming-ingest q149 runs
    * against a table a parquet file sink just landed. */
  def sessionsFromMs(ev: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    withSessionSeq(ev, gapMs)
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

  /** q126: first-order Markov model — the q77 transition counts
    * row-normalized into conditional probabilities p(next | prev) as
    * exact rationals (×1e6): the actual language-model / next-action
    * table the counts exist to feed. The normalization is a window
    * sum over the |types|² transition matrix — metadata-scale — so
    * the LM build costs exactly what the counting did. The floor-sum
    * of each row is ≤ 1e6 with deficit < |types| (the spec pins it). */
  def markovQuery(spark: SparkSession, dir: String): DataFrame = {
    val counts = transitionsQuery(spark, dir)
    val byPrev = Window.partitionBy("prev_type")
    counts
      .withColumn("row_total", sum(col("n")).over(byPrev))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 div row_total").as("p_e6"))
      .orderBy("prev_type", "next_type")
  }

  /** DuckDB oracle for [[markovQuery]]. */
  def markovOracleSql: String =
    """WITH p AS (SELECT user_id,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
         FROM events),
       c AS (SELECT prev_type, next_type, count(*) AS n FROM p
             WHERE prev_type IS NOT NULL GROUP BY 1, 2)
     SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type)
         AS BIGINT) AS p_e6
     FROM c ORDER BY 1, 2"""

  /** q199: the Markov model EVALUATED — holdout next-event top-1
    * accuracy: transitions from even-id users train the argmax
    * predictor (most frequent next type per prev, ties to the
    * lexicographically first — deterministic), transitions from
    * odd-id users score it. The eval closes the q126 loop: q126
    * builds the conditional table, this measures what it buys —
    * per prev-state hit counts and e6 hit rate on unseen users.
    * Scale shape: ONE user-keyed lag pass (the q77 shuffle) feeds a
    * (grp × types²)-row count table; train argmax, holdout join, and
    * the rate arithmetic all run over that metadata-scale frame.
    * Holdout prev states the train half never saw are dropped by the
    * inner join (no prediction exists to score). */
  def markovEvalQuery(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val counts = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(byTime))
      .filter(col("prev_type").isNotNull)
      .withColumn("grp", pmod(col("user_id"), lit(2L)))
      .groupBy("grp", "prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // types²-scale; feeds train AND holdout
    val trainRank = Window.partitionBy("prev_type")
      .orderBy(col("n").desc, col("next_type").asc)
    val predicted = counts.filter(col("grp") === 0)
      .withColumn("rk", row_number().over(trainRank))
      .filter(col("rk") === 1)
      .select(col("prev_type"), col("next_type").as("predicted"))
    counts.filter(col("grp") === 1)
      .join(predicted, Seq("prev_type"))
      .groupBy("prev_type")
      .agg(min(col("predicted")).as("predicted"),
        sum(col("n")).cast("long").as("n_test"),
        sum(when(col("next_type") === col("predicted"), col("n"))
          .otherwise(0L)).cast("long").as("n_hits"))
      .withColumn("hit_e6",
        expr("CAST(n_hits * 1000000 div n_test AS BIGINT)"))
      .orderBy("prev_type")
  }

  /** DuckDB oracle for [[markovEvalQuery]]. */
  def markovEvalOracleSql: String =
    """WITH p AS (SELECT user_id % 2 AS grp,
           lag(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
         FROM events),
       c AS (SELECT grp, prev_type, next_type, count(*) AS n FROM p
             WHERE prev_type IS NOT NULL GROUP BY 1, 2, 3),
       pred AS (SELECT prev_type, next_type AS predicted FROM c
                WHERE grp = 0
                QUALIFY row_number() OVER (PARTITION BY prev_type
                  ORDER BY n DESC, next_type) = 1),
       t AS (SELECT c.prev_type, predicted, next_type, n
             FROM c JOIN pred USING (prev_type) WHERE grp = 1)
     SELECT prev_type, min(predicted) AS predicted,
       CAST(sum(n) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN next_type = predicted THEN n ELSE 0 END)
         AS BIGINT) AS n_hits,
       CAST(sum(CASE WHEN next_type = predicted THEN n ELSE 0 END)
         * 1000000 // sum(n) AS BIGINT) AS hit_e6
     FROM t GROUP BY 1 ORDER BY 1"""

  /** q127: audience overlap — pairwise Jaccard similarity between the
    * user sets of every event-type pair (which behaviors share an
    * audience, the segmentation-design input). Set sizes come from one
    * distinct count per type; intersections from ONE self-join of the
    * distinct (type, user) table keyed on the user — each partition
    * intersects one user's type list (≤ |types| wide), so the pair
    * table never materializes user-set cross products. Union sizes
    * and Jaccard (×1e6) are arithmetic via inclusion-exclusion. */
  def audienceOverlapQuery(spark: SparkSession, dir: String): DataFrame = {
    // the events-wide distinct feeds the sizes aggregate and both
    // self-join sides — one corpus pass, not three.
    val tu = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint()
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("sz"))
    val inter = tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("t1"),
        col("sz").as("sz1"))), Seq("t1"))
      .join(broadcast(sizes.select(col("event_type").as("t2"),
        col("sz").as("sz2"))), Seq("t2"))
      .select(col("t1"), col("t2"), col("sz1"), col("sz2"), col("n_both"),
        expr("n_both * 1000000 div (sz1 + sz2 - n_both)")
          .as("jaccard_e6"))
      .orderBy("t1", "t2")
  }

  /** DuckDB oracle for [[audienceOverlapQuery]]. */
  def audienceOverlapOracleSql: String =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
       s AS (SELECT event_type, count(*) AS sz FROM tu GROUP BY 1),
       i AS (SELECT a.event_type AS t1, b.event_type AS t2,
               count(*) AS n_both
             FROM tu a JOIN tu b ON a.user_id = b.user_id
               AND a.event_type < b.event_type
             GROUP BY 1, 2)
     SELECT i.t1, i.t2,
       CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2,
       CAST(i.n_both AS BIGINT) AS n_both,
       CAST(i.n_both * 1000000 // (s1.sz + s2.sz - i.n_both) AS BIGINT)
         AS jaccard_e6
     FROM i JOIN s s1 ON s1.event_type = i.t1
       JOIN s s2 ON s2.event_type = i.t2
     ORDER BY t1, t2"""

  /** q129: recency-decayed activity score — each user's events
    * weighted by a half-life decay computed in INTEGERS: an event
    * `w` whole weeks before the corpus max contributes
    * 1024 >> min(w, 10) points (half-life = one week, floor-halved —
    * the deterministic stand-in for exp(-λ·age), same ranking
    * behavior, zero float divergence). One broadcast 1-row max, one
    * scan to score, one user-keyed sum, TakeOrdered for the top
    * [[DecayTopN]] — the engagement leaderboard a reactivation
    * campaign pulls. */
  val DecayTopN = 20

  def decayScoreQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
    val maxMs = ev.agg(max(col("ms")).as("max_ms"))
    ev.crossJoin(broadcast(maxMs))
      .withColumn("w", expr("(max_ms - ms) div 604800000"))
      .withColumn("pts",
        expr("shiftright(1024L, CAST(least(w, 10L) AS INT))"))
      .groupBy("user_id")
      .agg(sum(col("pts")).as("score"), count(lit(1)).as("n_events"))
      .orderBy(col("score").desc, col("user_id").asc)
      .limit(DecayTopN)
  }

  /** DuckDB oracle for [[decayScoreQuery]] (top 20). */
  def decayScoreOracleSql: String =
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
       m AS (SELECT max(ms) AS max_ms FROM e),
       p AS (SELECT user_id,
               1024 >> least((max_ms - ms) // 604800000, 10) AS pts
             FROM e, m)
     SELECT user_id, CAST(sum(pts) AS BIGINT) AS score,
       CAST(count(*) AS BIGINT) AS n_events
     FROM p GROUP BY 1
     ORDER BY score DESC, user_id LIMIT $DecayTopN"""

  /** q79: concurrent-sessions curve — per hour, the MAXIMUM number of
    * simultaneously open sessions (capacity planning's load curve).
    * Classic sweep-line: each session contributes +1 at its start and
    * -1 just after its end; the running sum of deltas at each boundary
    * timestamp is the concurrency there.
    *
    * The running sum is the same DISTRIBUTED TWO-PHASE PREFIX SUM as
    * [[PrepPipeline.packingOffsets]] — a naive global
    * `Window.orderBy(t)` would sort every boundary point in one
    * partition (boundary count = 2× sessions = corpus-scale). Phase 1
    * accumulates within hour blocks (the output grain); phase 2
    * prefix-sums the per-hour subtotals over the BLOCK table — one row
    * per hour in the data's time range, metadata-scale by construction
    * — via the shared `OlapOps.blockOffsets` triangular join, all on
    * executors (no driver collect, no single-partition window at any
    * scale). */
  def concurrencyQuery(spark: SparkSession, dir: String,
                       gapMs: Long = 1800000L): DataFrame =
    concurrencyCurve(Tables.events(spark, dir), gapMs)

  /** [[concurrencyQuery]] over an explicit events frame (user_id,
    * event_id, ts) — the composable/property-testable form. */
  def concurrencyCurve(events: DataFrame, gapMs: Long): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
    val iv = events
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("t"))
      .withColumn("new_s",
        when(lag(col("t"), 1).over(byTime).isNull ||
          col("t") - lag(col("t"), 1).over(byTime) > gapMs, 1).otherwise(0))
      .withColumn("seq", sum(col("new_s")).over(byTime))
      .groupBy("user_id", "seq")
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val pts = iv.select(col("t0").as("t"), lit(1L).as("delta"))
      .unionAll(iv.select((col("t1") + 1).as("t"), lit(-1L).as("delta")))
    // the delta table feeds BOTH phase-2 branches (block offsets and
    // the in-block cumsum); pin it so the session build + union runs
    // once (the multi-branch convention the sketch operators use)
    val agg = pts.groupBy("t").agg(sum(col("delta")).as("d"))
      .withColumn("block", expr("t div 3600000"))
      .localCheckpoint()
    val inBlock = Window.partitionBy("block").orderBy("t")
    val bt = agg.groupBy("block").agg(sum(col("d")).as("bt"))
    val offsets = OlapOps.blockOffsets(bt, "block", descending = false,
        Seq(("bt", "sum", "offset")))
      .select(col("block"), coalesce(col("offset"), lit(0L)).as("offset"))
    agg.withColumn("run_local", sum(col("d")).over(inBlock))
      .join(broadcast(offsets), Seq("block"))
      .withColumn("open_s", col("offset") + col("run_local"))
      .groupBy("block")
      .agg(max(col("open_s")).cast("long").as("max_open"),
        count(lit(1)).as("n_points"))
      .select(col("block").as("hour_id"), col("max_open"),
        col("n_points").cast("long").as("n_points"))
      .orderBy("hour_id")
  }

  /** DuckDB oracle for [[concurrencyQuery]] — single global cumsum
    * (the oracle may centralize; the engine must not). */
  def concurrencyOracleSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_id FROM events),
       g AS (SELECT user_id, t,
               CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000
                 THEN 1 ELSE 0 END AS new_s
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       s AS (SELECT user_id, t, sum(new_s) OVER
               (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS seq FROM g),
       iv AS (SELECT user_id, seq, min(t) AS t0, max(t) AS t1
              FROM s GROUP BY 1, 2),
       pts AS (SELECT t0 AS t, 1 AS delta FROM iv
               UNION ALL SELECT t1 + 1, -1 FROM iv),
       agg AS (SELECT t, sum(delta) AS d FROM pts GROUP BY 1),
       run AS (SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                 AS open_s FROM agg)
     SELECT t // 3600000 AS hour_id, CAST(max(open_s) AS BIGINT) AS max_open,
       CAST(count(*) AS BIGINT) AS n_points
     FROM run GROUP BY 1 ORDER BY 1"""

  /** q80: retention cohorts — users grouped by their FIRST active day,
    * counted on each subsequent day offset (the activation/retention
    * triangle). Two aggregations: per-user first day (map-side
    * combined), then a user-keyed join back — both shuffles keyed on
    * user_id, so at scale they share one exchange under AQE; the
    * cohort table is |users| rows, never corpus-sized. */
  def retentionQuery(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = d.groupBy("user_id").agg(min(col("day")).as("cohort"))
    d.join(cohorts, Seq("user_id"))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** DuckDB oracle for [[retentionQuery]]. */
  def retentionOracleSql: String =
    """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
       c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1)
     SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(d.day - c.cohort AS BIGINT) AS day_offset,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
     FROM d JOIN c USING (user_id)
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

  /** q92: rolling 7-day distinct active users (the WAU curve) per
    * observed day. The naive formulation — count(DISTINCT) over a
    * RANGE window — is not computable as a frame aggregate, and a
    * per-day self-join against a ±6-day range re-reads the event table
    * once per day. This is the scalable EXPAND shape instead: dedup
    * events to (user, day) pairs once, explode each pair into the ≤ 7
    * target days it contributes to, and count distinct users per
    * target day. Total intermediate volume is |distinct user-days| × 7
    * — linear, partitioned, and independent of how many events share a
    * user-day (the dedup happens BEFORE the fan-out). Target days are
    * restricted to observed event days via a broadcast semi-join on
    * the (tiny) day spine. */
  def rollingActiveQuery(spark: SparkSession, dir: String,
      windowDays: Int = 7): DataFrame =
    rollingActive(Tables.events(spark, dir), windowDays)

  /** [[rollingActiveQuery]] over an explicit (user_id, ts) frame —
    * the testable core. */
  def rollingActive(events: DataFrame, windowDays: Int): DataFrame = {
    val pairs = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val spine = pairs.select(col("day").as("wday")).distinct()
    pairs
      .select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))).as("wday"))
      .join(broadcast(spine), Seq("wday"), "left_semi")
      .groupBy("wday")
      .agg(count_distinct(col("user_id")).as("active_users"))
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"),
        col("active_users"))
      .orderBy("day")
  }

  /** DuckDB oracle for [[rollingActiveQuery]] — the per-day range
    * formulation (fine at oracle scale): users active in
    * [day-6, day]. */
  def rollingActiveOracleSql: String =
    """WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
         FROM events),
       s AS (SELECT DISTINCT day FROM p)
     SELECT strftime(s.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS active_users
     FROM s JOIN p ON p.day BETWEEN s.day - 6 AND s.day
     GROUP BY 1 ORDER BY 1"""

  /** q106: session path mining — the top user journeys, as the
    * ordered event-type sequence of each gap-defined session (capped
    * at the first [[PathMaxLen]] steps) counted corpus-wide. Rides the
    * SAME single user_id shuffle as [[sessionQuery]]: session
    * assignment (lag + running sum), per-session ordered collect, and
    * the path string are all inside one partitioning; the only second
    * shuffle is the path-keyed count, whose keys are capped-length
    * strings. Per-session arrays are bounded by session length (the
    * gap bounds them in wall-time; the cap bounds the path either
    * way), never by a user's full history. */
  val PathMaxLen = 8

  def sessionPathsQuery(spark: SparkSession, dir: String,
      gapMs: Long = 1800000L, topN: Int = 10): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("t"))
      .withColumn("new_sess",
        when(lag(col("t"), 1).over(byTime).isNull ||
          col("t") - lag(col("t"), 1).over(byTime) > gapMs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(byTime))
      .groupBy("user_id", "session_seq")
      .agg(sort_array(collect_list(struct(col("t"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(array_join(
        transform(slice(col("evs"), 1, PathMaxLen),
          e => e.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topN)
  }

  /** DuckDB oracle for [[sessionPathsQuery]] (gap 30 min, top 10). */
  def sessionPathsOracleSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS t FROM events),
       m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
               OR t - lag(t) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
             FROM e WINDOW w AS (PARTITION BY user_id
               ORDER BY t, event_id)),
       s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
               ORDER BY t, event_id) AS session_seq FROM m),
       p AS (SELECT array_to_string(
               (list(event_type ORDER BY t, event_id))[1:$PathMaxLen],
               '>') AS path
             FROM s GROUP BY user_id, session_seq)
     SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
     FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 10"""

  /** q132: daily bounce rate — the share of sessions that contain
    * exactly one event, by the session's start day (the engagement
    * health metric every product dashboard leads with). Rides the
    * q46 sessionization (one user shuffle); the daily rollup is a
    * second aggregation over the SESSION table (already
    * session-sized, not event-sized), with the rate as an exact
    * rational. */
  def bounceRateQuery(spark: SparkSession, dir: String): DataFrame =
    sessionQuery(spark, dir)
      .select(
        date_format(timestamp_millis(col("start_ms")), "yyyy-MM-dd")
          .as("day"),
        (col("n_events") === 1).cast("long").as("bounce"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("bounce")).as("n_bounces"))
      .withColumn("bounce_rate_e6",
        expr("n_bounces * 1000000 div n_sessions"))
      .orderBy("day")

  /** DuckDB oracle for [[bounceRateQuery]] (gap 30 min). */
  def bounceRateOracleSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS t
         FROM events),
       m AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
               OR t - lag(t) OVER w > 1800000 THEN 1 ELSE 0 END AS ns
             FROM e WINDOW w AS (PARTITION BY user_id
               ORDER BY t, event_id)),
       s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
               ORDER BY t, event_id) AS session_seq FROM m),
       g AS (SELECT user_id, session_seq, count(*) AS n_events,
               min(t) AS start_ms
             FROM s GROUP BY 1, 2),
       d AS (SELECT strftime(epoch_ms(start_ms), '%Y-%m-%d') AS day,
               CASE WHEN n_events = 1 THEN 1 ELSE 0 END AS bounce
             FROM g)
     SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(bounce) AS BIGINT) AS n_bounces,
       CAST(sum(bounce) * 1000000 // count(*) AS BIGINT)
         AS bounce_rate_e6
     FROM d GROUP BY 1 ORDER BY 1"""

  /** q115: funnel time-to-convert — for users who complete the whole
    * signup→view→click→purchase funnel (q63's chained recurrence),
    * the end-to-end latency distribution: completer count plus
    * rank-selected median and p95 milliseconds. The latency table is
    * completer-sized, and the percentiles use the DISTRIBUTED
    * two-phase rank ([[OlapOps.globalRankAsc]]), not a single-
    * partition window — the same discipline as q85/q102 applied to
    * the funnel's output. The product question behind it: "how long
    * does a converting user take?" */
  def funnelLatencyQuery(spark: SparkSession, dir: String): DataFrame = {
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
    val lat = timed.filter(col("t_purchase").isNotNull)
      .select(col("user_id").as("id"),
        (col("t_purchase") - col("t_signup")).as("cents"))
    // blockWidth 1 minute: completer latencies are mostly sub-day, so
    // a day-wide block would put every row in one block and degrade
    // the two-phase rank to a single partition; minute blocks spread
    // the distribution across many blocks. Percentile INDICES are
    // pure integer arithmetic — (n+1) div 2 = ceil(n/2) and
    // (19n+19) div 20 = ceil(19n/20) — so engine and oracle agree by
    // construction, not via bit-identical IEEE multiplication.
    OlapOps.globalRankAsc(lat, blockWidth = 60000L)
      .agg(max(col("n_total")).as("n_completers"),
        min(when(col("rn") === expr("(n_total + 1) div 2"), col("cents")))
          .as("median_ms"),
        min(when(col("rn") === expr("(19 * n_total + 19) div 20"),
          col("cents"))).as("p95_ms"))
  }

  /** DuckDB oracle for [[funnelLatencyQuery]] — the funnel recurrence
    * plus a single global rank (fine at oracle scale). */
  def funnelLatencyOracleSql: String =
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
     lat AS (SELECT user_id, t_purchase - t_signup AS ms FROM s4
             WHERE t_purchase IS NOT NULL),
     r AS (SELECT ms, row_number() OVER (ORDER BY ms, user_id) AS rn,
             count(*) OVER () AS n FROM lat)
     SELECT CAST(max(n) AS BIGINT) AS n_completers,
       min(CASE WHEN rn = (n + 1) // 2 THEN ms END)
         AS median_ms,
       min(CASE WHEN rn = (19 * n + 19) // 20 THEN ms END)
         AS p95_ms
     FROM r"""

  /** q124: conversion by activity decile — funnel completion rate per
    * engagement segment: users bucketed into deciles by total event
    * count (the distributed two-phase rank, as everywhere), joined to
    * their q63 funnel-completion flag, with the completion rate per
    * decile as an exact rational. The segmentation join is keyed on
    * user_id between two USER-sized derived tables — the fact table
    * was consumed once by each branch — so the analytics composition
    * costs two fact passes and metadata-scale arithmetic. The answer
    * to "do heavy users convert more?", deterministically. */
  def conversionByDecileQuery(spark: SparkSession,
      dir: String): DataFrame = {
    val stages = Seq("signup", "view", "click", "purchase")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
    val stageArrays = stages.map(s => sort_array(collect_list(
      when(col("event_type") === s, col("ms")))).as(s"a_$s"))
    // ONE per-user aggregation carries both the funnel stage arrays
    // and the activity count — same grouping key, so splitting them
    // into two groupBys would scan and shuffle the fact table twice
    // for no reason. The per-user result is checkpointed: the
    // conversion flag and the rank input both branch from it.
    val perUser = stages.zipWithIndex.foldLeft(
      ev.groupBy("user_id").agg(stageArrays.head,
        (stageArrays.tail :+ count(lit(1)).as("cents")): _*)) {
      case (df, (s, 0)) =>
        df.withColumn(s"t_$s", try_element_at(col(s"a_$s"), lit(1)))
      case (df, (s, i)) =>
        val prev = s"t_${stages(i - 1)}"
        df.withColumn(s"t_$s", try_element_at(
          filter(col(s"a_$s"), x => x >= col(prev)), lit(1)))
    }.localCheckpoint()
    val converted = perUser.select(col("user_id").as("id"),
      col("t_purchase").isNotNull.cast("long").as("converted"))
    val activity = perUser.select(col("user_id").as("id"), col("cents"))
    val ranked = OlapOps.globalRankAsc(activity, blockWidth = 100L)
      .withColumn("decile",
        expr("(rn - 1) * 10 div n_total").cast("int") + 1)
    ranked.join(converted, Seq("id"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      .withColumn("rate_e6",
        expr("n_converted * 1000000 div n_users"))
      .orderBy("decile")
  }

  /** DuckDB oracle for [[conversionByDecileQuery]]. */
  def conversionByDecileOracleSql: String =
    """WITH u AS (SELECT user_id,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'signup')) AS a_signup,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'view')) AS a_view,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'click')) AS a_click,
         list_sort(list(epoch_ms(ts)) FILTER (WHERE event_type = 'purchase')) AS a_purchase
       FROM events GROUP BY 1),
     s1 AS (SELECT *, a_signup[1] AS t_signup FROM u),
     s2 AS (SELECT *, (list_filter(a_view, x -> x >= t_signup))[1] AS t_view FROM s1),
     s3 AS (SELECT *, (list_filter(a_click, x -> x >= t_view))[1] AS t_click FROM s2),
     s4 AS (SELECT user_id, CASE WHEN (list_filter(a_purchase,
              x -> x >= t_click))[1] IS NOT NULL THEN 1 ELSE 0 END
              AS converted FROM s3),
     act AS (SELECT user_id AS id, count(*) AS cents FROM events
             GROUP BY 1),
     rk AS (SELECT id, cents,
             row_number() OVER (ORDER BY cents, id) AS rn,
             count(*) OVER () AS n_total FROM act),
     d AS (SELECT id, CAST((rn - 1) * 10 // n_total AS INT) + 1
             AS decile FROM rk)
     SELECT d.decile, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(s4.converted) AS BIGINT) AS n_converted,
       CAST(sum(s4.converted) * 1000000 // count(*) AS BIGINT)
         AS rate_e6
     FROM d JOIN s4 ON s4.user_id = d.id
     GROUP BY 1 ORDER BY 1"""

  /** q164: FIRST-TOUCH attribution — each purchase's value credited
    * to the event type that OPENED its session (the acquisition-
    * channel rule: whatever brought the user in gets the revenue).
    * Gap sessionization (q46's 30-minute rule), the session's first
    * event type propagated by a per-session window, then one small
    * aggregate per entry type: sessions opened, purchases landed,
    * attributed cents (NaN/Inf sanitized, decimal accumulation), and
    * the per-session conversion rate as an e6 rational.
    *
    * Scale shape: both windows (session numbering, first-touch
    * propagate) partition by user / (user, session) over the same
    * time sort — keyed shuffles, never a global window — and the
    * output is event-type cardinality. */
  /** The shared q164/q165 pre-aggregation frame: sanitized values
    * ([[Tables.events]]'s NaN/Inf gotcha), epoch-ms times, and the
    * gap-rule session numbering via [[withSessionSeq]]. */
  private def labeledSessions(spark: SparkSession, dir: String,
      gapMs: Long): DataFrame =
    withSessionSeq(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("t"),
          coalesce(when(isnan(col("value")) ||
            col("value") === Double.PositiveInfinity ||
            col("value") === Double.NegativeInfinity, lit(null))
            .otherwise(col("value")), lit(0.0)).as("v")),
      gapMs)

  /** The per-session time order q164/q165 rank touchpoints in. */
  private val bySess = Window.partitionBy("user_id", "session_seq")
    .orderBy(col("t").asc, col("event_id").asc)

  def attributionQuery(spark: SparkSession, dir: String,
      gapMs: Long = 1800000L): DataFrame =
    // ONE pass: session openers, purchase counts, and purchase value
    // all aggregate from the same windowed frame — every session's
    // opener carries its own entry_type, so grouping the full row set
    // by entry_type sees every key the join formulation would
    labeledSessions(spark, dir, gapMs)
      .withColumn("entry_type", first(col("event_type")).over(bySess))
      .groupBy(col("entry_type"))
      .agg(sum(col("new_sess")).cast("long").as("n_sessions"),
        count(when(col("event_type") === "purchase", 1))
          .as("n_purchases"),
        coalesce((round(sum(when(col("event_type") === "purchase",
            col("v")).cast("decimal(38,10)")), 2) * 100).cast("long"),
          lit(0L)).as("attributed_cents"))
      .select(col("entry_type"), col("n_sessions"), col("n_purchases"),
        col("attributed_cents"),
        expr("n_purchases * 1000000 div n_sessions").as("conv_e6"))
      .orderBy("entry_type")

  /** q165: LAST-TOUCH attribution — the companion rule to q164: each
    * purchase credits the touchpoint immediately BEFORE it in the
    * session (what closed the deal, vs what opened the door); a
    * purchase that opens its own session credits itself. Same keyed
    * windows as q164 plus one lag; output per touch type: purchases,
    * attributed cents, and the share of all purchases (e6). */
  def lastTouchQuery(spark: SparkSession, dir: String,
      gapMs: Long = 1800000L): DataFrame = {
    val purchases = labeledSessions(spark, dir, gapMs)
      .withColumn("touch_type",
        coalesce(lag(col("event_type"), 1).over(bySess),
          col("event_type")))
      .filter(col("event_type") === "purchase")
      .localCheckpoint()
    val total = purchases.agg(count(lit(1)).as("n_total"))
    purchases.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        (round(sum(col("v").cast("decimal(38,10)")), 2) * 100)
          .cast("long").as("attributed_cents"))
      .crossJoin(broadcast(total))
      .select(col("touch_type"), col("n_purchases"),
        col("attributed_cents"),
        expr("n_purchases * 1000000 div n_total").as("share_e6"))
      .orderBy("touch_type")
  }

  /** Shared CTE prefix of the q164/q165 oracles — sanitize, epoch-ms,
    * gap-rule session numbering: the SQL twin of [[labeledSessions]],
    * one definition so the two attribution oracles cannot drift on
    * the sessionization itself. */
  private val attributionCte: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
           CAST(epoch_ms(ts) AS BIGINT) AS t,
           coalesce(CASE WHEN isnan(value) OR NOT isfinite(value)
             THEN NULL ELSE value END, 0.0) AS v
         FROM events),
       s AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
               OR t - lag(t) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       q AS (SELECT *, sum(new_sess) OVER
               (PARTITION BY user_id ORDER BY t, event_id) AS session_seq
             FROM s)"""

  /** DuckDB oracle for [[lastTouchQuery]]. */
  def lastTouchOracleSql: String = attributionCte +
    """, f AS (SELECT *, coalesce(lag(event_type) OVER
               (PARTITION BY user_id, session_seq ORDER BY t, event_id),
               event_type) AS touch_type
             FROM q),
       pur AS (SELECT touch_type, CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(round(sum(CAST(v AS DECIMAL(38,10))), 2) * 100
                    AS BIGINT) AS attributed_cents
               FROM f WHERE event_type = 'purchase' GROUP BY 1),
       tot AS (SELECT CAST(sum(n_purchases) AS BIGINT) AS n_total FROM pur)
     SELECT touch_type, n_purchases, attributed_cents,
       CAST(n_purchases * 1000000 // n_total AS BIGINT) AS share_e6
     FROM pur, tot ORDER BY touch_type"""

  /** DuckDB oracle for [[attributionQuery]]. */
  def attributionOracleSql: String = attributionCte +
    """, f AS (SELECT *, first_value(event_type) OVER
               (PARTITION BY user_id, session_seq ORDER BY t, event_id)
               AS entry_type
             FROM q),
       ses AS (SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions
               FROM f WHERE new_sess = 1 GROUP BY 1),
       pur AS (SELECT entry_type, CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(round(sum(CAST(v AS DECIMAL(38,10))), 2) * 100
                    AS BIGINT) AS attributed_cents
               FROM f WHERE event_type = 'purchase' GROUP BY 1)
     SELECT ses.entry_type, ses.n_sessions,
       coalesce(pur.n_purchases, 0) AS n_purchases,
       coalesce(pur.attributed_cents, 0) AS attributed_cents,
       CAST(coalesce(pur.n_purchases, 0) * 1000000 // ses.n_sessions
            AS BIGINT) AS conv_e6
     FROM ses LEFT JOIN pur USING (entry_type) ORDER BY entry_type"""

  /** q173: MATCH_RECOGNIZE-lite sequence-pattern detection — each
    * session's event types collapse to a one-char-per-event string
    * (c/e/p/s/v: the initial letter is unique across the five types)
    * and regular expressions count behavioral motifs over it:
    * `conversions` = non-overlapping `v[^p]*p` matches (a view
    * eventually followed by a purchase — the canonical intent→action
    * motif), `click_runs` = maximal `cc+` runs (rage/bot-like
    * repeated clicking). This is the row-pattern-matching surface SQL
    * gets from MATCH_RECOGNIZE and Flink from CEP, rebuilt on the
    * engine's own primitives: the gap-rule sessionization
    * ([[withSessionSeq]] — the SAME definition q46/q164 use) bounds
    * each string to one session, so state is O(session length), never
    * O(user lifetime).
    *
    * Scale shape: ONE user_id shuffle drives the sessionization
    * windows, then one (user, session) aggregation builds the
    * strings; the regex runs post-aggregation on session-bounded
    * strings — per-row work proportional to session size, no second
    * shuffle (session keys are a refinement of the user partitioning,
    * and AQE coalesces the map-side-combined aggregation). Both
    * engines' regex semantics agree here: leftmost, non-overlapping,
    * greedy — `[^p]*` cannot skip a `p`, and `cc+` is maximal, so
    * matches are structurally unambiguous (proven in SessionizeSpec).
    *
    * Determinism: the per-session string is built by array_sort over
    * (t, event_id, ch) structs — the total order the oracle's
    * `string_agg(... ORDER BY t, event_id)` uses — never by
    * collect_list's arrival order. */
  def sessionPatternQuery(spark: SparkSession, dir: String,
      gapMs: Long = 1800000L): DataFrame =
    sessionPatterns(labeledSessions(spark, dir, gapMs))

  /** [[sessionPatternQuery]]'s core over an already-sessionized frame
    * with (user_id, session_seq, event_id, t, event_type) — separated
    * so specs can drive hand-built sessions through the string-build
    * and regex stages directly. */
  def sessionPatterns(sessions: DataFrame): DataFrame =
    sessions
      .withColumn("ch", substring(col("event_type"), 1, 1))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(col("t"), col("event_id"),
            col("ch")))),
          x => x.getField("ch")), "").as("seq"))
      .select(col("user_id"), col("session_seq").cast("long"),
        col("n_events").cast("long").as("n_events"), col("seq"),
        size(regexp_extract_all(col("seq"), lit("(v[^p]*p)"), lit(1)))
          .cast("long").as("conversions"),
        size(regexp_extract_all(col("seq"), lit("(cc+)"), lit(1)))
          .cast("long").as("click_runs"))
      .orderBy("user_id", "session_seq")

  /** DuckDB oracle for [[sessionPatternQuery]] — same session CTE as
    * q164/q165, ordered string_agg, same regexes (group 1, as Spark's
    * regexp_extract_all extracts a group, not the whole match). */
  def sessionPatternOracleSql: String = attributionCte +
    """, g AS (SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           string_agg(substr(event_type, 1, 1), '' ORDER BY t, event_id)
             AS seq
         FROM q GROUP BY 1, 2)
     SELECT user_id, session_seq, n_events, seq,
       CAST(len(regexp_extract_all(seq, '(v[^p]*p)', 1)) AS BIGINT)
         AS conversions,
       CAST(len(regexp_extract_all(seq, '(cc+)', 1)) AS BIGINT)
         AS click_runs
     FROM g ORDER BY user_id, session_seq"""

  /** q270: inter-arrival BURSTINESS per event type — the squared
    * coefficient of variation of the gap distribution
    * (CV² = var/mean²): exponential (Poisson-process) gaps give
    * CV² = 1, so cv2_e6 ≈ 1,000,000 means memoryless arrivals,
    * well above means bursts, well below means metronome regularity
    * (a cron job, not users). This is the stream-shape diagnostic
    * that sizes streaming capacity — a bursty type needs state/
    * backlog headroom its MEAN rate hides.
    *
    * All EXACT integer arithmetic: with n gaps g_i (ms), biased
    * var = (n·Σg² − (Σg)²)/n² and mean² = (Σg)²/n², so
    * CV² = (n·Σg² − (Σg)²)/(Σg)² — one exact rational, floor-scaled
    * e6 in DECIMAL(38,0)/HUGEINT with an integral divide (the q264
    * discipline; Σg² at 100 TB would move this to doubles, noted
    * since it only diagnoses). The lag window is PARTITIONED by
    * event type — per-type gap streams, no global window anywhere. */
  def fanoQuery(spark: SparkSession, dir: String): DataFrame =
    interArrivalCv2(Tables.events(spark, dir))

  /** [[fanoQuery]]'s core over any (event_id, ts, event_type) frame. */
  def interArrivalCv2(events: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type")
      .orderBy(col("t").asc, col("event_id").asc)
    val gaps = events
      .select(col("event_type"), col("event_id"),
        unix_millis(col("ts")).as("t"))
      .withColumn("g", col("t") - lag(col("t"), 1).over(byType))
      .filter(col("g").isNotNull)
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        sum(d38(col("g")) * d38(col("g"))).as("sg2"))
      .select(col("event_type"), col("n").cast("long").as("n_gaps"),
        expr("sg div n").cast("long").as("mean_gap_ms"),
        expr("""(CAST(n AS DECIMAL(38,0)) * sg2
                 - CAST(sg AS DECIMAL(38,0)) * CAST(sg AS DECIMAL(38,0)))
                * 1000000 div
                (CAST(sg AS DECIMAL(38,0)) * CAST(sg AS DECIMAL(38,0)))""")
          .cast("long").as("cv2_e6"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[fanoQuery]] — same per-type lag gaps, same
    * HUGEINT rational, same floor-e6 scale. */
  def fanoOracleSql: String =
    """WITH e AS (SELECT event_type, event_id,
           epoch_ms(ts) AS t FROM events),
       g AS (SELECT event_type,
           t - lag(t) OVER (PARTITION BY event_type
             ORDER BY t, event_id) AS g
         FROM e),
       s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
           CAST(sum(g) AS HUGEINT) AS sg,
           sum(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS sg2
         FROM g WHERE g IS NOT NULL GROUP BY 1)
     SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       CAST(sg // n AS BIGINT) AS mean_gap_ms,
       CAST((n * sg2 - sg * sg) * 1000000 // (sg * sg) AS BIGINT)
         AS cv2_e6
     FROM s ORDER BY event_type"""
}
