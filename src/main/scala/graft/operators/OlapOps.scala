package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multi-dimensional OLAP operators rounding out the analytics
  * surface: rollup subtotals, pivot, frame-window running stats, and
  * discrete percentiles. Each is expressed with the declarative API so
  * Catalyst plans the standard shapes (Expand for rollup, a single
  * shuffle per window partitioning), and each output is constructed
  * portably (decimal-cents sums, selected — not interpolated —
  * percentile values) so the DuckDB oracle hash-checks exactly. */
object OlapOps {

  /** Decimal-accumulated sum over doubles emitted as BIGINT cents —
    * THE engine-wide definition of the money-exactness idiom
    * (accumulate in DECIMAL(38,10), associative, so partial-agg order
    * can't change the result; round to 2 decimals, scale by 100 —
    * integral longs are the only numeric type every engine converts
    * identically). [[Queries]] and [[Maintenance]] delegate here. */
  private[graft] def decSumCents(c: Column): Column =
    (round(sum(c.cast("decimal(38,10)")), 2) * 100).cast("long")

  /** q50: month × order-status rollup with subtotal and grand-total
    * rows (grouping_id distinguishes levels; dimension nulls on
    * subtotal rows are folded to 'ALL' so the output is null-free).
    * Rollup plans as ONE Expand + one aggregation — each input row is
    * replicated per grouping set map-side and partially aggregated
    * before the single shuffle, so subtotals do NOT cost extra passes
    * over the data at scale. */
  def rollupQuery(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.rollup(col("order_month"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        decSumCents(col("o_totalprice")).as("total_cents"),
        grouping_id().cast("int").as("gid"))
      .select(coalesce(col("order_month"), lit("ALL")).as("order_month"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("gid"), col("n_orders").cast("long").as("n_orders"),
        col("total_cents"))
      .orderBy("gid", "order_month", "o_orderstatus")
  }

  /** q66: SCD type-2 interval build — collapse each user's event-type
    * stream into validity intervals [valid_from, valid_to) with a
    * version counter, the slowly-changing-dimension shape every
    * warehouse load needs (track attribute history, not snapshots).
    * Two window passes over ONE user_id shuffle: change-detection
    * (lag) filters to transition rows, then lead/row_number over the
    * survivors close each interval at its successor's start (the open
    * interval's valid_to stays null). Partition width = one entity's
    * history — bounded by the hottest key, never the corpus. */
  def scd2Query(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("prev", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ms"), 1).over(byTime))
      .withColumn("version", row_number().over(byTime).cast("long"))
      .select(col("user_id"), col("event_type"),
        col("ms").as("valid_from"), col("valid_to"), col("version"))
      .orderBy("user_id", "version")
  }

  /** DuckDB oracle for [[scd2Query]]. */
  def scd2OracleSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS ms FROM events),
       ch AS (SELECT * FROM e
              QUALIFY lag(event_type) OVER
                (PARTITION BY user_id ORDER BY ms, event_id)
                IS DISTINCT FROM event_type),
       iv AS (SELECT user_id, event_type, ms AS valid_from,
                lead(ms) OVER w2 AS valid_to,
                CAST(row_number() OVER w2 AS BIGINT) AS version
              FROM ch
              WINDOW w2 AS (PARTITION BY user_id ORDER BY ms, event_id))
     SELECT user_id, event_type, valid_from, valid_to, version FROM iv
     ORDER BY user_id, version"""

  /** q108: SCD2 point-in-time lookup — the state of every entity AS OF
    * a fixed instant, read straight off the q66 validity intervals:
    * the one version per entity whose [valid_from, valid_to) contains
    * [[AsOfMs]] (2024-01-15T00:00:00Z). This is the time-travel query
    * the interval build exists to serve; the filter is two scan-side
    * predicates on the interval table — no window, no join, and at
    * scale it prunes to interval-table cardinality before anything
    * shuffles (the ORDER BY is the only exchange). Entities whose
    * history starts after the instant are absent, as they should be. */
  val AsOfMs = 1705276800000L // 2024-01-15T00:00:00Z

  def scd2AsOfQuery(spark: SparkSession, dir: String): DataFrame =
    scd2Query(spark, dir)
      .filter(col("valid_from") <= AsOfMs &&
        (col("valid_to").isNull || col("valid_to") > AsOfMs))
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from"), col("version"))
      .orderBy("user_id")

  /** DuckDB oracle for [[scd2AsOfQuery]]. */
  def scd2AsOfOracleSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS ms FROM events),
       ch AS (SELECT * FROM e
              QUALIFY lag(event_type) OVER
                (PARTITION BY user_id ORDER BY ms, event_id)
                IS DISTINCT FROM event_type),
       iv AS (SELECT user_id, event_type, ms AS valid_from,
                lead(ms) OVER w2 AS valid_to,
                CAST(row_number() OVER w2 AS BIGINT) AS version
              FROM ch
              WINDOW w2 AS (PARTITION BY user_id ORDER BY ms, event_id))
     SELECT user_id, event_type AS state, valid_from, version
     FROM iv
     WHERE valid_from <= $AsOfMs
       AND (valid_to IS NULL OR valid_to > $AsOfMs)
     ORDER BY user_id"""

  /** q109: temporal (interval) dimension join — every event attached
    * to the dimension VERSION that was active at its event time (the
    * warehouse pattern for joining facts to an SCD2 dimension), then
    * rolled up to per-interval occupancy. The join is an equi-join on
    * the entity key with two range predicates on the interval bounds:
    * Catalyst plans the equi part as the shuffle key, so each
    * partition only range-scans ONE entity's (bounded) version list —
    * the shape that survives a 100 TB fact table, unlike a pure range
    * join. Intervals here are the q66 output built from the same
    * events, so every event lands in exactly one interval and the
    * occupancy counts are the interval run lengths — an invariant the
    * spec asserts. */
  def temporalJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val iv = scd2Query(spark, dir)
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from"), col("valid_to"), col("version"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"))
    ev.join(iv, ev("user_id") === iv("user_id") &&
        col("ms") >= col("valid_from") &&
        (col("valid_to").isNull || col("ms") < col("valid_to")))
      .groupBy(iv("user_id").as("user_id"), col("version"),
        col("state"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "version")
  }

  /** DuckDB oracle for [[temporalJoinQuery]]. */
  def temporalJoinOracleSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
           epoch_ms(ts) AS ms FROM events),
       ch AS (SELECT * FROM e
              QUALIFY lag(event_type) OVER
                (PARTITION BY user_id ORDER BY ms, event_id)
                IS DISTINCT FROM event_type),
       iv AS (SELECT user_id, event_type AS state, ms AS valid_from,
                lead(ms) OVER w2 AS valid_to,
                CAST(row_number() OVER w2 AS BIGINT) AS version
              FROM ch
              WINDOW w2 AS (PARTITION BY user_id ORDER BY ms, event_id))
     SELECT iv.user_id, iv.version, iv.state,
       CAST(count(*) AS BIGINT) AS n_events
     FROM e JOIN iv ON e.user_id = iv.user_id
       AND e.ms >= iv.valid_from
       AND (iv.valid_to IS NULL OR e.ms < iv.valid_to)
     GROUP BY 1, 2, 3 ORDER BY 1, 2"""

  /** q64: priority × status CUBE — all four grouping sets in one pass
    * (q50's rollup emits only the prefix hierarchy; CUBE adds the
    * status-only subtotals). Same Expand-based single-aggregation plan
    * shape as rollup: each input row replicates once per grouping set
    * map-side, partials combine before the one shuffle — subtotal
    * depth never costs extra scans. */
  def cubeQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        decSumCents(col("o_totalprice")).as("total_cents"),
        grouping_id().cast("int").as("gid"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("gid"), col("n_orders").cast("long").as("n_orders"),
        col("total_cents"))
      .orderBy("gid", "o_orderpriority", "o_orderstatus")

  /** q172: explicit GROUPING SETS — the arbitrary-subset form that
    * completes the q50 ROLLUP / q64 CUBE family. The two sets here,
    * ((order_month), (o_orderstatus)), are exactly what neither
    * hierarchy gives: two independent one-dimension summaries with NO
    * cross product and NO grand total — the "one pass, several
    * dashboards" shape. Plans as the same single Expand + one
    * aggregation as rollup/cube: each input row replicates once per
    * set map-side and partials combine before the one shuffle, so at
    * 100 TB the second summary is free relative to running two
    * groupBys (which would scan the fact table twice). The level tag
    * is derived from which dimension is null (dialect-neutral, unlike
    * grouping_id whose bit order is engine-defined). */
  def groupingSetsQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .groupingSets(
        Seq(Seq(col("order_month")), Seq(col("o_orderstatus"))),
        col("order_month"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        decSumCents(col("o_totalprice")).as("total_cents"))
      .select(
        when(col("order_month").isNull, lit("by_status"))
          .otherwise(lit("by_month")).as("level"),
        coalesce(col("order_month"), lit("ALL")).as("order_month"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n_orders").cast("long").as("n_orders"), col("total_cents"))
      .orderBy("level", "order_month", "o_orderstatus")

  /** DuckDB oracle for [[groupingSetsQuery]] — the same two grouping
    * sets spelled in SQL; level tag from the null dimension. */
  def groupingSetsOracleSql: String =
    """WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_orderstatus, o_totalprice FROM orders),
       g AS (SELECT order_month, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 2) * 100 AS BIGINT) AS total_cents
         FROM o GROUP BY GROUPING SETS ((order_month), (o_orderstatus)))
     SELECT CASE WHEN order_month IS NULL THEN 'by_status'
              ELSE 'by_month' END AS level,
       coalesce(order_month, 'ALL') AS order_month,
       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       n_orders, total_cents
     FROM g ORDER BY 1, 2, 3"""

  /** q51: pivot event counts into one column per event type. The
    * value list is EXPLICIT — with an inferred list Spark first runs a
    * distinct scan, and the output schema depends on the data; a
    * fixed list keeps the plan a single groupBy with conditional
    * aggregation, which is also exactly what the oracle SQL writes. */
  def pivotQuery(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).cast("long").as(s"n_$t")): _*)
      .orderBy("user_id")
  }

  /** q52: running per-user event-value sum over a 3-row frame (the
    * moving-window primitive behind rate/trend features). Values are
    * NaN/Inf-sanitized first (same rule as the q18 sanitize operator)
    * and accumulated in DECIMAL so the frame sum is order-exact on
    * both engines. One shuffle: the user_id window partitioning. */
  def movingWindowQuery(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("t").asc, col("event_id").asc)
      .rowsBetween(-2, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("t"),
        coalesce(when(isnan(col("value")) ||
          col("value") === Double.PositiveInfinity ||
          col("value") === Double.NegativeInfinity, lit(null))
          .otherwise(col("value")), lit(0.0)).as("v"))
      .select(col("user_id"), col("event_id"),
        (round(sum(col("v").cast("decimal(38,10)")).over(byTime), 2) * 100)
          .cast("long").as("mv_sum_cents"))
      .orderBy("user_id", "event_id")
  }

  /** q74: calendar gap-fill — zero-filled hourly event counts per type
    * over the corpus's global [min, max] hour range (the densification
    * step every time-series feature/chart pipeline needs: a missing
    * bucket must surface as 0, not as an absent row). The spine is
    * `sequence(h0, h1, 1 hour) × fixed type list` — metadata-scale
    * regardless of corpus size (bounded by the time range, not the
    * event count) — so it broadcasts into a left join against the
    * one aggregated pass over the events. The type list is explicit
    * for the same reason as [[pivotQuery]]'s: no distinct pre-scan,
    * schema independent of data. */
  def gapFillQuery(spark: SparkSession, dir: String): DataFrame =
    gapFill(Tables.events(spark, dir),
      Seq("click", "error", "purchase", "signup", "view"))

  /** [[gapFillQuery]] over an explicit (ts, event_type) frame and type
    * list — the composable form (and the planted-gap test surface). */
  def gapFill(events: DataFrame, types: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    val ev = events.select(col("ts"), col("event_type"))
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val spine = bounds
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("hour"))
      .crossJoin(spark.createDataFrame(
        types.map(Tuple1(_))).toDF("event_type"))
    val cnt = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    spine.join(cnt, Seq("hour", "event_type"), "left")
      .select(date_format(col("hour"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("hour", "event_type")
  }

  /** DuckDB oracle for [[gapFillQuery]]. */
  def gapFillOracleSql: String =
    """WITH b AS (SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS h0,
           CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS h1 FROM events),
       hrs AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
           AS hour FROM b),
       types AS (SELECT unnest(['click','error','purchase','signup','view'])
           AS event_type),
       cnt AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                 event_type, count(*) AS n FROM events GROUP BY 1, 2)
     SELECT strftime(h.hour, '%Y-%m-%d %H') AS hour,
       t.event_type AS event_type,
       CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_events
     FROM hrs h CROSS JOIN types t
     LEFT JOIN cnt ON cnt.hour = h.hour AND cnt.event_type = t.event_type
     ORDER BY 1, 2"""

  /** q75: IQR outlier fences per event type — Tukey's rule with a 1.5
    * multiplier, computed entirely in integer cents so both engines
    * agree bit-for-bit: quartiles are SELECTED corpus values (the q53
    * rank-selection pattern), the fences are integer arithmetic on
    * them (the 3·IQR/2 division is non-negative, so truncating and
    * flooring division agree), and the outlier count is an integer
    * comparison. Two passes over events (rank window + fence count),
    * both keyed on event_type; the fence table is per-type rows and
    * broadcasts. */
  def outlierFencesQuery(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.events(spark, dir)
      .filter(!isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    val byVal = Window.partitionBy("event_type")
      .orderBy(col("cents").asc, col("event_id").asc)
    val byType = Window.partitionBy("event_type")
    val qs = f
      .select(col("event_type"), col("cents"),
        row_number().over(byVal).as("rn"),
        count(lit(1)).over(byType).as("n"))
      .groupBy("event_type")
      .agg(max(col("n")).cast("long").as("n"),
        // (n+3) div 4 = ceil(n/4), (3n+3) div 4 = ceil(3n/4): exact
        // integer quartile indices, no IEEE multiply
        min(when(col("rn") === expr("(n + 3) div 4"), col("cents")))
          .as("q1_cents"),
        min(when(col("rn") === expr("(3 * n + 3) div 4"), col("cents")))
          .as("q3_cents"))
    val fen = qs.select(col("event_type"), col("n"),
      col("q1_cents"), col("q3_cents"),
      expr("q1_cents - (3 * (q3_cents - q1_cents)) div 2").as("lo_cents"),
      expr("q3_cents + (3 * (q3_cents - q1_cents)) div 2").as("hi_cents"))
    f.join(broadcast(fen), Seq("event_type"))
      .groupBy("event_type", "n", "q1_cents", "q3_cents",
        "lo_cents", "hi_cents")
      .agg(count(when(col("cents") < col("lo_cents") ||
        col("cents") > col("hi_cents"), 1)).as("n_outliers"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[outlierFencesQuery]]. */
  def outlierFencesOracleSql: String =
    """WITH f AS (SELECT event_type, event_id,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events WHERE NOT isnan(value) AND isfinite(value)),
       r AS (SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY cents, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
             FROM f),
       qs AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                min(CASE WHEN rn = (n + 3) // 4
                    THEN cents END) AS q1_cents,
                min(CASE WHEN rn = (3 * n + 3) // 4
                    THEN cents END) AS q3_cents
              FROM r GROUP BY 1),
       fen AS (SELECT event_type, n, q1_cents, q3_cents,
                 q1_cents - (3 * (q3_cents - q1_cents)) // 2 AS lo_cents,
                 q3_cents + (3 * (q3_cents - q1_cents)) // 2 AS hi_cents
               FROM qs)
     SELECT fen.event_type, fen.n, fen.q1_cents, fen.q3_cents,
       fen.lo_cents, fen.hi_cents,
       CAST(count(*) FILTER (WHERE f.cents < fen.lo_cents
            OR f.cents > fen.hi_cents) AS BIGINT) AS n_outliers
     FROM fen JOIN f ON f.event_type = fen.event_type
     GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1"""

  /** q53: discrete percentiles (median, p95) of event values per
    * type — SELECTED corpus values, never interpolated arithmetic, so
    * the doubles pass through bit-identically on both engines.
    * Formulated as explicit rank selection (row_number vs the exact
    * integer index (n+1) div 2 / (19n+19) div 20) rather than an
    * engine percentile function, which makes the semantics portable
    * by construction. Non-finite values are
    * excluded (their sort order is engine-specific). */
  def percentileQuery(spark: SparkSession, dir: String): DataFrame = {
    val byValue = Window.partitionBy("event_type")
      .orderBy(col("value").asc, col("event_id").asc)
    val byType = Window.partitionBy("event_type")
    Tables.events(spark, dir)
      .filter(!isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity)
      .select(col("event_type"), col("event_id"), col("value"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(byType).as("n"))
      .groupBy("event_type")
      .agg(
        max(col("n")).cast("long").as("n"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("value")))
          .as("median_value"),
        min(when(col("rn") === expr("(19 * n + 19) div 20"), col("value")))
          .as("p95_value"))
      .orderBy("event_type")
  }

  /** q197: winsorized mean per event type — the robust-mean pass an
    * outlier-heavy metric column needs: per-stratum p05/p95 bounds
    * selected by the q53 explicit-rank rule (SELECTED corpus values,
    * never interpolation), every value CLAMPED into [lo, hi], then an
    * exact integer mean over cents. Winsorizing (clamping) rather
    * than trimming keeps n constant, so the mean is comparable
    * across strata with different tail mass. Scale shape: one keyed
    * window pass to select the two bounds per stratum (the q53
    * shape), bounds broadcast back onto the scan, one
    * map-side-combinable aggregation. */
  def winsorizedMeanQuery(spark: SparkSession, dir: String): DataFrame = {
    val byValue = Window.partitionBy("event_type")
      .orderBy(col("cents").asc, col("event_id").asc)
    val byType = Window.partitionBy("event_type")
    val vals = Tables.events(spark, dir)
      .filter(!isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    val bounds = vals
      .select(col("event_type"), col("cents"),
        row_number().over(byValue).as("rn"),
        count(lit(1)).over(byType).as("n"))
      .groupBy("event_type")
      .agg(
        min(when(col("rn") === expr("greatest((5 * n + 99) div 100, 1)"),
          col("cents"))).as("lo"),
        min(when(col("rn") === expr("(95 * n + 99) div 100"),
          col("cents"))).as("hi"))
    vals.join(broadcast(bounds), Seq("event_type"))
      .withColumn("w", greatest(col("lo"), least(col("hi"), col("cents"))))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n"),
        min(col("lo")).cast("long").as("lo_cents"),
        min(col("hi")).cast("long").as("hi_cents"),
        sum(col("w")).cast("long").as("winsor_sum_cents"))
      .withColumn("winsor_mean_cents",
        expr("CAST(winsor_sum_cents div n AS BIGINT)"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[winsorizedMeanQuery]]. */
  def winsorizedMeanOracleSql: String =
    """WITH v AS (SELECT event_type, event_id,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events
         WHERE NOT isnan(value) AND isfinite(value)),
       rk AS (SELECT event_type, cents,
           row_number() OVER (PARTITION BY event_type
             ORDER BY cents, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
         FROM v),
       b AS (SELECT event_type,
           min(CASE WHEN rn = greatest((5 * n + 99) // 100, 1)
             THEN cents END) AS lo,
           min(CASE WHEN rn = (95 * n + 99) // 100
             THEN cents END) AS hi
         FROM rk GROUP BY 1),
       w AS (SELECT v.event_type,
           greatest(b.lo, least(b.hi, v.cents)) AS wc, b.lo, b.hi
         FROM v JOIN b ON v.event_type = b.event_type)
     SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(min(lo) AS BIGINT) AS lo_cents,
       CAST(min(hi) AS BIGINT) AS hi_cents,
       CAST(sum(wc) AS BIGINT) AS winsor_sum_cents,
       CAST(sum(wc) // count(*) AS BIGINT) AS winsor_mean_cents
     FROM w GROUP BY 1 ORDER BY 1"""

  /** q207: burst detection — the volume-anomaly alert a monitoring
    * pipeline runs on every (event type, day): today's count against
    * the trailing-7-day baseline (previous days only, so today never
    * dilutes its own baseline), with the classic doubling/halving
    * alert rule in exact integer form: spike when n·days > 2·trail,
    * drop when 2·n·days < trail (cross-multiplied — no division, no
    * rationals). Early days with a short baseline still report (the
    * actual trailing-day count rides along); the trailing sum is a
    * ROWS window over the per-(type, day) count table — metadata
    * scale after one map-side-combinable aggregation of events. */
  def burstDetectQuery(spark: SparkSession, dir: String): DataFrame =
    burstDetect(Tables.events(spark, dir))

  /** [[burstDetectQuery]]'s core over any (event_type, ts) frame. */
  def burstDetect(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(-7, -1)
    daily
      .withColumn("trail_n", coalesce(sum(col("n")).over(trail), lit(0L)))
      .withColumn("trail_days", count(lit(1)).over(trail))
      .select(col("event_type"), col("d"), col("n").cast("long").as("n"),
        col("trail_n").cast("long").as("trail_n"),
        col("trail_days").cast("long").as("trail_days"),
        when(col("trail_days") > 0 &&
          col("n") * col("trail_days") > col("trail_n") * 2, 1)
          .otherwise(0).cast("int").as("spike"),
        when(col("trail_days") > 0 &&
          col("n") * col("trail_days") * 2 < col("trail_n"), 1)
          .otherwise(0).cast("int").as("drop"))
      .orderBy("event_type", "d")
  }

  /** q220: CUSUM changepoint detection per event type — the
    * sustained-shift complement to q207's spike rule (Page 1954): a
    * one-sided CUSUM accumulates deviations from a baseline mean and
    * alarms when the SUM crosses a threshold, catching small level
    * shifts a per-day ratio test never sees. All integer: the
    * baseline is the first 7 days' TOTAL (so the per-day mean enters
    * scaled by 7 — no division), slack is mu7 div 20 (5%), and the
    * recursive S_t = max(0, S_{t-1} + d_t) is computed by its closed
    * form S_t = pref_t − min(0, min_{j≤t} pref_j) — a running sum and
    * a running min, both plain windows, so the "recursion" costs two
    * ROWS-window passes over the per-(type, day) table (metadata
    * scale; series run in parallel under partitionBy). */
  def cusumQuery(spark: SparkSession, dir: String): DataFrame =
    cusumDetect(Tables.events(spark, dir))

  /** [[cusumQuery]]'s core over any (event_type, ts) frame. */
  def cusumDetect(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("n"))
    val byD = Window.partitionBy("event_type").orderBy("d")
    val run = byD.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRn = daily.withColumn("rn", row_number().over(byD))
    val base = withRn.filter(col("rn") <= 7)
      .groupBy("event_type").agg(sum(col("n")).as("mu7"))
    withRn.join(broadcast(base), Seq("event_type"))
      .withColumn("dev_up",
        col("n") * 7 - col("mu7") - expr("mu7 div 20"))
      .withColumn("dev_dn",
        col("mu7") - col("n") * 7 - expr("mu7 div 20"))
      .withColumn("pu", sum(col("dev_up")).over(run))
      .withColumn("pd", sum(col("dev_dn")).over(run))
      .withColumn("cusum_up",
        col("pu") - least(lit(0L), min(col("pu")).over(run)))
      .withColumn("cusum_dn",
        col("pd") - least(lit(0L), min(col("pd")).over(run)))
      .select(col("event_type"), col("d"), col("n").cast("long").as("n"),
        col("cusum_up").cast("long").as("cusum_up"),
        col("cusum_dn").cast("long").as("cusum_dn"),
        when(col("cusum_up") > col("mu7"), 1).otherwise(0)
          .cast("int").as("alert_up"),
        when(col("cusum_dn") > col("mu7"), 1).otherwise(0)
          .cast("int").as("alert_dn"))
      .orderBy("event_type", "d")
  }

  /** DuckDB oracle for [[cusumQuery]] — same scaled-integer CUSUM via
    * the same running-sum/running-min closed form. */
  def cusumOracleSql: String =
    """WITH daily AS (SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       rn AS (SELECT event_type, d, n,
           row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
         FROM daily),
       mu AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS mu7
              FROM rn WHERE rn <= 7 GROUP BY 1),
       dev AS (SELECT r.event_type, d, n, mu7,
           7 * n - mu7 - mu7 // 20 AS dev_up,
           mu7 - 7 * n - mu7 // 20 AS dev_dn
         FROM rn r JOIN mu ON r.event_type = mu.event_type),
       pref AS (SELECT event_type, d, n, mu7,
           sum(dev_up) OVER (PARTITION BY event_type ORDER BY d
             ROWS UNBOUNDED PRECEDING) AS pu,
           sum(dev_dn) OVER (PARTITION BY event_type ORDER BY d
             ROWS UNBOUNDED PRECEDING) AS pd
         FROM dev),
       cs AS (SELECT event_type, d, n, mu7,
           pu - least(0, min(pu) OVER (PARTITION BY event_type
             ORDER BY d ROWS UNBOUNDED PRECEDING)) AS cu,
           pd - least(0, min(pd) OVER (PARTITION BY event_type
             ORDER BY d ROWS UNBOUNDED PRECEDING)) AS cd
         FROM pref)
     SELECT event_type, d, n, CAST(cu AS BIGINT) AS cusum_up,
       CAST(cd AS BIGINT) AS cusum_dn,
       CAST(CASE WHEN cu > mu7 THEN 1 ELSE 0 END AS INT) AS alert_up,
       CAST(CASE WHEN cd > mu7 THEN 1 ELSE 0 END AS INT) AS alert_dn
     FROM cs ORDER BY event_type, d"""

  /** DuckDB oracle for [[burstDetectQuery]]. */
  def burstDetectOracleSql: String =
    """WITH daily AS (SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d,
           CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY 1, 2),
       w AS (SELECT event_type, d, n,
           CAST(coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS trail_n,
           CAST(count(*) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
             AS trail_days
         FROM daily)
     SELECT event_type, d, n, trail_n, trail_days,
       CAST(CASE WHEN trail_days > 0 AND n * trail_days > trail_n * 2
         THEN 1 ELSE 0 END AS INT) AS spike,
       CAST(CASE WHEN trail_days > 0 AND n * trail_days * 2 < trail_n
         THEN 1 ELSE 0 END AS INT) AS drop
     FROM w ORDER BY event_type, d"""

  /** q84: set-operation audience segmentation — every customer active
    * in 1994 or 1995 labeled 'both' / 'only_1994' / 'only_1995' via
    * INTERSECT and EXCEPT (the remaining relational-algebra set ops
    * after q20's UNION DISTINCT). Each branch plans as a distinct-
    * aggregate or left-anti shape on the same two year-filtered
    * distinct sets; the year filter pushes to the scan, so the three
    * branches share one pruned column read. */
  def setOpsQuery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
    val a = o.filter(col("y") === 1994).select("o_custkey").distinct()
    val b = o.filter(col("y") === 1995).select("o_custkey").distinct()
    a.intersect(b).withColumn("status", lit("both"))
      .unionAll(a.except(b).withColumn("status", lit("only_1994")))
      .unionAll(b.except(a).withColumn("status", lit("only_1995")))
      .orderBy("o_custkey", "status")
  }

  /** DuckDB oracle for [[setOpsQuery]]. */
  def setOpsOracleSql: String =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
           WHERE year(o_orderdate) = 1994),
       b AS (SELECT DISTINCT o_custkey FROM orders
           WHERE year(o_orderdate) = 1995)
     SELECT o_custkey, 'both' AS status
       FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
     UNION ALL
     SELECT o_custkey, 'only_1994'
       FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
     UNION ALL
     SELECT o_custkey, 'only_1995'
       FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
     ORDER BY o_custkey, status"""

  /** q85: value-decile summary of order totals via a DISTRIBUTED
    * global rank. A plain `ntile`/`row_number` over an unpartitioned
    * window is the canonical scale-killer (Spark warns and moves the
    * whole table to ONE partition); here the global rank is the
    * two-phase prefix-sum shape the engine already uses for packing
    * (q55) and sweep-lines (q79): rows rank WITHIN value blocks
    * (block = cents div 10M — a window partitioned by block), block
    * COUNTS prefix-sum into offsets over a block-count-sized table,
    * and the broadcast offsets complete the global rank. Decile
    * boundaries are integer arithmetic on (rank, N): bucket sizes
    * follow floor((rn-1)·10/N) — deterministic, oracle-recomputable,
    * no interpolation. */
  def decileQuery(spark: SparkSession, dir: String): DataFrame =
    decileSummary(Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        (round(col("o_totalprice").cast("decimal(38,10)"), 2) * 100)
          .cast("long").as("cents")))

  /** [[decileQuery]] over an explicit (o_orderkey, cents) frame — the
    * composable/property-testable form. */
  def decileSummary(rows: DataFrame): DataFrame = {
    // unlike globalRankAsc, the input here is a raw pruned scan (no
    // upstream aggregation) — re-reading it per branch is cheaper than
    // materializing, so no checkpoint
    val r = rows.withColumn("block", expr("cents div 10000000"))
    // ranking DESC: a block's offset is the count of rows in HIGHER
    // blocks (the block table is ~tens of rows — metadata-scale)
    val bt = r.groupBy("block").agg(count(lit(1)).as("bn"))
    val offsets = blockOffsets(bt, "block", descending = true,
        Seq(("bn", "sum", "offset")))
      .select(col("block"), coalesce(col("offset"), lit(0L)).as("offset"))
    val total = bt.agg(sum(col("bn")).as("n_total"))
    val inBlock = Window.partitionBy("block")
      .orderBy(col("cents").desc, col("o_orderkey").asc)
    r.withColumn("rn_local", row_number().over(inBlock))
      .join(broadcast(offsets), "block")
      .crossJoin(broadcast(total))
      .withColumn("rn", col("offset") + col("rn_local"))
      .withColumn("decile",
        expr("(rn - 1) * 10 div n_total").cast("int") + 1)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
        sum(col("cents")).as("sum_cents"))
      .orderBy("decile")
  }

  /** DuckDB oracle for [[decileQuery]] — a single global window (fine
    * at oracle scale) with the same floor-division decile rule. */
  def decileOracleSql: String =
    """WITH r AS (SELECT o_orderkey,
           CAST(round(CAST(o_totalprice AS DECIMAL(38,10)), 2) * 100
                AS BIGINT) AS cents FROM orders),
       rk AS (SELECT cents,
           row_number() OVER (ORDER BY cents DESC, o_orderkey) AS rn,
           count(*) OVER () AS n_total FROM r)
     SELECT CAST((rn - 1) * 10 // n_total AS INT) + 1 AS decile,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(cents) AS min_cents, max(cents) AS max_cents,
       CAST(sum(cents) AS BIGINT) AS sum_cents
     FROM rk GROUP BY 1 ORDER BY 1"""

  /** q88: unpivot / melt — the four lineitem money-ish measures
    * normalized from wide columns into (measure, cents) rows, then
    * summarized per return flag. Uses the built-in `Dataset.unpivot`,
    * which plans as ONE Expand over the narrow 5-column projection (no
    * join, no shuffle until the final small aggregate), so melting a
    * 100 TB fact table costs a single scan with map-side partial
    * aggregation. The wide→long step is the standard feature-table →
    * EAV normalization a training pipeline runs before per-feature
    * statistics. */
  def unpivotQuery(spark: SparkSession, dir: String): DataFrame = {
    val cents = (c: String) =>
      (round(col(c).cast("decimal(38,10)"), 2) * 100).cast("long").as(c)
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents("l_quantity"),
        cents("l_extendedprice"), cents("l_discount"), cents("l_tax"))
      .unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "cents")
      .groupBy("l_returnflag", "measure")
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total_cents"))
      .orderBy("l_returnflag", "measure")
  }

  /** DuckDB oracle for [[unpivotQuery]] — UNION ALL spelling of the
    * same melt (portable across engines; DuckDB's UNPIVOT would work
    * too but the UNION ALL form pins the measure labels exactly). */
  def unpivotOracleSql: String = {
    val branch = (c: String) =>
      s"""SELECT l_returnflag, '$c' AS measure,
            CAST(round(CAST($c AS DECIMAL(38,10)), 2) * 100 AS BIGINT)
              AS cents FROM lineitem"""
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(branch).mkString(
        "WITH m AS (", " UNION ALL ",
        """) SELECT l_returnflag, measure,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS total_cents
           FROM m GROUP BY 1, 2 ORDER BY 1, 2""")
  }

  /** q89: capped sorted list aggregation (LISTAGG/STRING_AGG) — per
    * nation, the supplier count and a roster of AT MOST [[ListAggCap]]
    * alphabetically-first supplier names joined by ','. The cap is
    * applied with a row_number window BEFORE collect_list, so the
    * per-group array the aggregate buffers is bounded by the cap — a
    * group with a billion members costs the same memory as one with
    * 25. The window and the groupBy share the same partitioning key,
    * so Catalyst plans ONE exchange for both. The full (uncapped)
    * member count rides the window's count(*) — no second scan. */
  val ListAggCap = 25

  def listAggQuery(spark: SparkSession, dir: String): DataFrame =
    listAgg(Tables.supplier(spark, dir), Tables.nation(spark, dir),
      ListAggCap)

  /** [[listAggQuery]] over explicit frames — the testable core. */
  def listAgg(supplier: DataFrame, nation: DataFrame,
      cap: Int): DataFrame = {
    val byNation = Window.partitionBy("s_nationkey")
    val ranked = supplier
      .select(col("s_nationkey"), col("s_name"),
        row_number().over(byNation.orderBy(col("s_name").asc)).as("rn"),
        count(lit(1)).over(byNation).as("n_all"))
    ranked.filter(col("rn") <= cap)
      .groupBy("s_nationkey")
      .agg(max(col("n_all")).as("n_suppliers"),
        array_join(array_sort(collect_list(col("s_name"))), ",")
          .as("roster"))
      .join(nation
        .select(col("n_nationkey").as("s_nationkey"), col("n_name")),
        Seq("s_nationkey"))
      .select(col("n_name"), col("n_suppliers"), col("roster"))
      .orderBy("n_name")
  }

  /** DuckDB oracle for [[listAggQuery]] — ordered list + slice. */
  def listAggOracleSql: String =
    s"""SELECT n.n_name,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         array_to_string((list(s.s_name ORDER BY s.s_name))[1:$ListAggCap],
           ',') AS roster
       FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
       GROUP BY 1 ORDER BY 1"""

  /** q90: per-group mode with a deterministic tie-break — the modal
    * order priority of each market segment (orders ⋈ customer). The
    * frequency table shrinks to |segments × priorities| rows in the
    * first aggregation (partial map-side combine does the heavy
    * lifting), and the mode is a rank-1 selection over that tiny
    * table — the window never sees fact-table cardinality. Ties break
    * to the alphabetically-first priority, making the answer unique
    * and oracle-recomputable. */
  def modeQuery(spark: SparkSession, dir: String): DataFrame =
    groupMode(Tables.orders(spark, dir), Tables.customer(spark, dir))

  /** [[modeQuery]] over explicit frames — the testable core. */
  def groupMode(orders: DataFrame, customer: DataFrame): DataFrame = {
    val counts = orders
      .join(customer
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
    val rank = Window.partitionBy("c_mktsegment")
      .orderBy(col("n_orders").desc, col("o_orderpriority").asc)
    counts.withColumn("rk", row_number().over(rank))
      .filter(col("rk") === 1)
      .select(col("c_mktsegment"), col("o_orderpriority"), col("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** DuckDB oracle for [[modeQuery]]. */
  def modeOracleSql: String =
    """WITH c AS (SELECT c.c_mktsegment, o.o_orderpriority,
           count(*) AS n_orders
         FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         GROUP BY 1, 2),
       r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY n_orders DESC, o_orderpriority) AS rk FROM c)
     SELECT c_mktsegment, o_orderpriority, CAST(n_orders AS BIGINT)
       AS n_orders FROM r WHERE rk = 1 ORDER BY c_mktsegment"""

  /** q93: one-pass co-moment components — per return flag, the exact
    * integer sums (n, Σq, Σd, Σq², Σqd, Σd²) over (quantity units,
    * price dollars) from which covariance / correlation / an OLS slope
    * are pure driver-side arithmetic. This is the distributed-moments
    * pattern: every component is an algebraic aggregate, so Spark
    * computes all six in ONE scan with map-side partial aggregation —
    * no second pass against a precomputed mean (the textbook two-pass
    * formulation), no shuffle beyond the final 3-group combine.
    * Integer units/dollars keep the check exact; at petabyte scale the
    * same shape runs on DECIMAL accumulators (documented bound: Σd²
    * fits a long through ~sf100 at these value ranges). */
  def comomentsQuery(spark: SparkSession, dir: String): DataFrame = {
    val q = round(col("l_quantity").cast("decimal(38,10)"), 0)
      .cast("long")
    val d = round(col("l_extendedprice").cast("decimal(38,10)"), 0)
      .cast("long")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), q.as("q"), d.as("d"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sum_q"), sum(col("d")).as("sum_d"),
        sum(col("q") * col("q")).as("sum_qq"),
        sum(col("q") * col("d")).as("sum_qd"),
        sum(col("d") * col("d")).as("sum_dd"))
      .orderBy("l_returnflag")
  }

  /** q94: equi-width value histogram WITH empty bins — order totals
    * bucketed into $25k-wide bins over the observed [min, max] range,
    * zero-filled so downstream charting/monitoring sees the gaps. The
    * fact table collapses to per-bin partials in one aggregation; the
    * bin spine is generated from a 1-row min/max aggregate (sequence +
    * explode — metadata-scale) and LEFT-joins the counts by broadcast.
    * Nothing is ever ranked or sorted at corpus cardinality, unlike
    * the quantile family (q53/q75/q85) — histograms are the O(scan)
    * distribution sketch. */
  val HistBinCents = 2500000L // $25,000 per bin

  def histogramQuery(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.orders(spark, dir)
      .select((round(col("o_totalprice").cast("decimal(38,10)"), 2) * 100)
        .cast("long").as("cents")), HistBinCents)

  /** [[histogramQuery]] over an explicit non-negative `cents` frame —
    * the testable core. */
  def histogram(values: DataFrame, widthCents: Long): DataFrame = {
    // integer div, not `/` (double division would lose exactness past
    // 2^53 cents); inputs are non-negative so div == floor-div (the
    // q54 cross-engine parity rule)
    val bins = values.select(expr(s"cents div ${widthCents}L").as("bin"))
    val counts = bins.groupBy("bin").agg(count(lit(1)).as("n_orders"))
    // min/max over the aggregated bin table, NOT the raw values — one
    // scan of the fact table total, and the spine agg reads bin-count
    // rows (metadata-scale)
    val spine = counts.agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bin"))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (col("bin") * widthCents).as("lo_cents"),
        ((col("bin") + 1) * widthCents - 1).as("hi_cents"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("bin")
  }

  /** DuckDB oracle for [[histogramQuery]]. Totals are non-negative so
    * truncating and flooring division agree (the q54 div/floor parity
    * rule). */
  def histogramOracleSql: String =
    s"""WITH b AS (SELECT CAST(round(CAST(o_totalprice AS DECIMAL(38,10)),
             2) * 100 AS BIGINT) // $HistBinCents AS bin FROM orders),
       c AS (SELECT bin, count(*) AS n FROM b GROUP BY 1),
       s AS (SELECT unnest(generate_series((SELECT min(bin) FROM b),
               (SELECT max(bin) FROM b))) AS bin)
     SELECT s.bin, s.bin * $HistBinCents AS lo_cents,
       (s.bin + 1) * $HistBinCents - 1 AS hi_cents,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
     FROM s LEFT JOIN c USING (bin) ORDER BY s.bin"""

  /** q97: median-absolute-deviation (MAD) robust outliers per event
    * type — the rank-selection sibling of the IQR fences (q75): median
    * via explicit row_number-vs-ceil selection, then the median of the
    * absolute deviations by the same machinery, then a count of points
    * beyond 3×MAD. Two windowed passes over per-type partitions plus a
    * broadcast of the (|event types|-row) fence table back onto the
    * values — the second pass re-partitions the DEVIATIONS, not a
    * wider row, and integer cents keep every selected value exact. */
  def madOutliersQuery(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.events(spark, dir)
      .filter(!isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    // MAD is inherently multi-pass; each re-read of `vals`/`devs` is a
    // column-pruned scan plus map-side arithmetic (no shuffle), which
    // costs less cluster-wide than materializing fact-scale frames —
    // measured slower with checkpoints here, so they stay lazy.
    def medianOf(df: DataFrame, valueCol: String,
        tieCol: String): DataFrame = {
      val byV = Window.partitionBy("event_type")
        .orderBy(col(valueCol).asc, col(tieCol).asc)
      val byT = Window.partitionBy("event_type")
      df.select(col("event_type"), col(valueCol),
          row_number().over(byV).as("rn"), count(lit(1)).over(byT).as("n"))
        .groupBy("event_type")
        .agg(min(when(col("rn") === expr("(n + 1) div 2"), col(valueCol)))
          .as(s"med_$valueCol"))
    }
    val med = medianOf(vals, "cents", "event_id")
    val devs = vals.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("event_id"), col("cents"),
        col("med_cents"), abs(col("cents") - col("med_cents")).as("dev"))
    val mad = medianOf(devs, "dev", "event_id")
    devs.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("med_cents")).as("median_cents"),
        max(col("med_dev")).as("mad_cents"),
        count(when(col("dev") > lit(3) * col("med_dev"), 1))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[madOutliersQuery]]. */
  def madOutliersOracleSql: String =
    """WITH v AS (SELECT event_type, event_id,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events WHERE NOT isnan(value) AND isfinite(value)),
       r1 AS (SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY cents, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n FROM v),
       m1 AS (SELECT event_type,
               min(CASE WHEN rn = (n + 1) // 2
                   THEN cents END) AS med_cents
             FROM r1 GROUP BY 1),
       d AS (SELECT v.event_type, v.event_id, v.cents, m1.med_cents,
               abs(v.cents - m1.med_cents) AS dev
             FROM v JOIN m1 USING (event_type)),
       r2 AS (SELECT event_type, dev,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY dev, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n FROM d),
       m2 AS (SELECT event_type,
               min(CASE WHEN rn = (n + 1) // 2
                   THEN dev END) AS med_dev
             FROM r2 GROUP BY 1)
     SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
       max(d.med_cents) AS median_cents,
       max(m2.med_dev) AS mad_cents,
       CAST(count(*) FILTER (WHERE d.dev > 3 * m2.med_dev) AS BIGINT)
         AS n_outliers
     FROM d JOIN m2 USING (event_type)
     GROUP BY 1 ORDER BY 1"""

  /** Distributed ascending global rank over a (`id`, `cents`) frame —
    * the two-phase prefix-sum shape shared with q55/q79/q85: rows rank
    * within value blocks (window partitioned by `cents div blockWidth`),
    * block counts prefix-sum into offsets over the metadata-scale block
    * table, broadcast offsets complete the rank. Returns the input plus
    * `rn` (1-based, ties broken by `id` asc) and `n_total`. */
  def globalRankAsc(rows: DataFrame, blockWidth: Long): DataFrame = {
    // three branches read the blocked input (offsets, total, the
    // ranked main pass) — materialize it once, or every branch
    // re-executes the caller's upstream aggregation (for q163's gini
    // that was three corpus-scale aggs per rank). The input is
    // entity-scale by contract (callers collapse facts to one row per
    // entity first), so the checkpoint is bounded; offsets/total stay
    // lazy — they re-aggregate the checkpointed blocks, which is
    // cheaper than a second materialization round-trip.
    val r = rows.withColumn("block", expr(s"cents div ${blockWidth}L"))
      .localCheckpoint()
    val bt = r.groupBy("block").agg(count(lit(1)).as("bn"))
    val offsets = blockOffsets(bt, "block", descending = false,
        Seq(("bn", "sum", "offset")))
      .select(col("block"), coalesce(col("offset"), lit(0L)).as("offset"))
    val total = bt.agg(sum(col("bn")).as("n_total"))
    val inBlock = Window.partitionBy("block")
      .orderBy(col("cents").asc, col("id").asc)
    r.withColumn("rn_local", row_number().over(inBlock))
      .join(broadcast(offsets), "block")
      .crossJoin(broadcast(total))
      .withColumn("rn", col("offset") + col("rn_local"))
      .drop("block", "rn_local", "offset")
  }

  /** THE cross-block combine of the blocked prefix shape, defined once
    * (it was hand-rolled four times — globalRankAsc/decileSummary here,
    * zipf/heaps in TextAnalysis, skyline in Curation — with subtle
    * per-site variations that were one divergent copy away from a
    * wrong offset). Given the BOUNDED block table `blocks` (ONE row
    * per `blk` — a groupBy result; metadata-scale by contract: value
    * ranges, decimal magnitudes, id ranges — never data cardinality),
    * returns one row per block carrying, for each (srcCol, fn, outName)
    * in `aggs`, fn ∈ {sum, max} combined over all STRICTLY-PRECEDING
    * blocks — preceding in ascending blk order, or descending when
    * `descending`. A block with no predecessor gets NULL (callers
    * coalesce to their own identity: 0 for rank offsets, −1 sentinel
    * for running maxima). Implemented as a broadcast triangular
    * self-join — |blocks|² in-memory pairs, bounded by the block-table
    * contract — so the plan contains NO single-partition WindowExec at
    * any scale (WindowAuditSpec sweeps for exactly that). */
  def blockOffsets(blocks: DataFrame, blk: String, descending: Boolean,
      aggs: Seq[(String, String, String)]): DataFrame = {
    val rhs = blocks.select(col(blk).as("__blk2") +:
      aggs.map { case (src, _, out) => col(src).as(s"__$out") }: _*)
    val cond =
      if (descending) col("__blk2") > col(blk)
      else col("__blk2") < col(blk)
    val aggExprs = aggs.map { case (_, fn, out) =>
      val c = col(s"__$out")
      (fn match {
        case "sum" => sum(c)
        case "max" => max(c)
        case other => throw new IllegalArgumentException(
          s"blockOffsets combine must be sum or max, got $other")
      }).as(out)
    }
    blocks.join(broadcast(rhs), cond, "left")
      .groupBy(col(blk))
      .agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** q102: quantile calibration — every customer balance mapped to the
    * SUPPLIER balance at the same quantile (the distribution-mapping
    * step behind quantile normalization of features and score
    * calibration across cohorts). Both sides get a distributed global
    * rank via [[globalRankAsc]] (no single-partition window on either
    * table), the target rank is pure integer arithmetic
    * ceil(rn_c·Ns/Nc), and the supplier lookup is a join on rank.
    * Balances are exact integer cents shifted by +100000 (acctbals can
    * be negative; the shift keeps the block arithmetic in div==floor
    * territory, and shifts cancel in the output). */
  def quantileMapQuery(spark: SparkSession, dir: String): DataFrame = {
    val shift = 100000L
    def cents(c: String) =
      (round(col(c).cast("decimal(38,10)"), 2) * 100).cast("long") + shift
    val cust = globalRankAsc(
      Tables.customer(spark, dir)
        .select(col("c_custkey").as("id"), cents("c_acctbal").as("cents")),
      blockWidth = 1000000L)
      .withColumnRenamed("n_total", "nc")
    val supp = globalRankAsc(
      Tables.supplier(spark, dir)
        .select(col("s_suppkey").as("id"), cents("s_acctbal").as("cents")),
      blockWidth = 1000000L)
      .withColumnRenamed("n_total", "ns")
      .select(col("rn").as("target_rn"), col("cents").as("calib_cents"),
        col("ns"))
      .localCheckpoint() // read twice: the ns scalar and the rank lookup
    cust
      .crossJoin(broadcast(supp.select("ns").distinct()))
      .withColumn("target_rn",
        expr("(rn * ns + nc - 1) div nc"))
      .join(supp.drop("ns"), Seq("target_rn"))
      .select(col("id").as("c_custkey"),
        (col("cents") - shift).as("bal_cents"),
        (col("calib_cents") - shift).as("calib_cents"))
      .orderBy("c_custkey")
  }

  /** DuckDB oracle for [[quantileMapQuery]] — single global windows
    * (fine at oracle scale), identical rank arithmetic. */
  def quantileMapOracleSql: String =
    """WITH c AS (SELECT c_custkey AS id,
           CAST(round(CAST(c_acctbal AS DECIMAL(38,10)), 2) * 100
             AS BIGINT) AS cents FROM customer),
       s AS (SELECT s_suppkey AS id,
           CAST(round(CAST(s_acctbal AS DECIMAL(38,10)), 2) * 100
             AS BIGINT) AS cents FROM supplier),
       cr AS (SELECT id, cents,
               row_number() OVER (ORDER BY cents, id) AS rn,
               count(*) OVER () AS nc FROM c),
       sr AS (SELECT cents AS calib_cents,
               row_number() OVER (ORDER BY cents, id) AS rn,
               count(*) OVER () AS ns FROM s)
     SELECT cr.id AS c_custkey, cr.cents AS bal_cents, sr.calib_cents
     FROM cr JOIN sr
       ON sr.rn = (cr.rn * (SELECT max(ns) FROM sr) + cr.nc - 1) // cr.nc
     ORDER BY c_custkey"""

  /** q104: token-budget apportionment by the largest-remainder
    * (Hamilton) method — a fixed training budget of [[BudgetTokens]]
    * split across languages proportionally to token mass, floor quotas
    * first, the leftover seats going to the largest remainders
    * (deterministic tie-break on language). The fact table collapses
    * to per-language mass in one aggregation; everything after is
    * arithmetic on a |languages|-row table. Exactly-integer, exactly
    * exhaustive: allocations always sum to the budget, asserted in the
    * spec and by the oracle. */
  val BudgetTokens = 1000000L

  def budgetAllocQuery(spark: SparkSession, dir: String): DataFrame =
    // the corpus tokenize+aggregate collapses to |languages| rows —
    // materialize that tiny frame once; budgetAlloc branches read it
    // three times (total, quotas, leftover)
    budgetAlloc(Tables.documents(spark, dir)
      .select(col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_toks"))
      .groupBy("lang").agg(sum(col("n_toks")).as("mass"))
      .localCheckpoint(),
      BudgetTokens)

  /** [[budgetAllocQuery]] over an explicit (lang, mass) frame. */
  def budgetAlloc(mass: DataFrame, budget: Long): DataFrame = {
    val total = mass.agg(sum(col("mass")).as("total"),
      count(lit(1)).as("n_langs"))
    val quotas = mass.crossJoin(broadcast(total))
      // decimal(38,0) intermediates (mass * 1e6 can pass 2^63 at real
      // corpus scale), cast back to BIGINT so the schema matches the
      // oracle exactly
      .withColumn("floor_alloc",
        expr(s"CAST(mass AS DECIMAL(38,0)) * ${budget}L div total")
          .cast("long"))
      .withColumn("rem_num",
        expr(s"CAST(mass AS DECIMAL(38,0)) * ${budget}L % total")
          .cast("long"))
    val leftover = quotas
      .agg((lit(budget) - sum(col("floor_alloc"))).cast("long")
        .as("seats"))
    val byRem = Window.orderBy(col("rem_num").desc, col("lang").asc)
    quotas.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(byRem))
      .select(col("lang"), col("mass"),
        (col("floor_alloc") +
          when(col("rk") <= col("seats"), 1L).otherwise(0L))
          .as("alloc_tokens"))
      .orderBy("lang")
  }

  /** DuckDB oracle for [[budgetAllocQuery]]. */
  def budgetAllocOracleSql: String =
    s"""WITH m AS (SELECT lang,
           CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+')))
             AS BIGINT) AS mass
         FROM documents GROUP BY 1),
       t AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM m),
       q AS (SELECT lang, mass,
               mass * $BudgetTokens // total AS floor_alloc,
               mass * $BudgetTokens % total AS rem_num
             FROM m, t),
       l AS (SELECT $BudgetTokens - CAST(sum(floor_alloc) AS BIGINT)
               AS seats FROM q),
       r AS (SELECT lang, mass, floor_alloc,
               row_number() OVER (ORDER BY rem_num DESC, lang) AS rk
             FROM q)
     SELECT lang, mass,
       CAST(floor_alloc + CASE WHEN rk <= (SELECT seats FROM l)
         THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
     FROM r ORDER BY lang"""

  /** q105: chi-square independence components for the market-segment ×
    * order-priority contingency table — observed counts with exact
    * integer expectation components (row total, column total, grand
    * total) and the scaled residual numerator obs·n − rowTot·colTot,
    * from which the test statistic is driver-side arithmetic. The
    * contingency table is one aggregation of the joined facts
    * (|segments × priorities| cells); margins come from window sums
    * over that tiny table, so independence testing at 100 TB costs
    * exactly one fact-table pass. */
  def chiSquareQuery(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(count(lit(1)).as("obs"))
    val byRow = Window.partitionBy("c_mktsegment")
    val byCol = Window.partitionBy("o_orderpriority")
    val all = Window.partitionBy()
    obs
      .withColumn("row_total", sum(col("obs")).over(byRow))
      .withColumn("col_total", sum(col("obs")).over(byCol))
      .withColumn("n", sum(col("obs")).over(all))
      .withColumn("resid_num",
        col("obs") * col("n") - col("row_total") * col("col_total"))
      .orderBy("c_mktsegment", "o_orderpriority")
  }

  /** DuckDB oracle for [[chiSquareQuery]]. */
  def chiSquareOracleSql: String =
    """WITH o AS (SELECT c.c_mktsegment, ord.o_orderpriority,
           count(*) AS obs
         FROM orders ord JOIN customer c ON c.c_custkey = ord.o_custkey
         GROUP BY 1, 2)
     SELECT c_mktsegment, o_orderpriority, CAST(obs AS BIGINT) AS obs,
       CAST(sum(obs) OVER (PARTITION BY c_mktsegment) AS BIGINT)
         AS row_total,
       CAST(sum(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         AS col_total,
       CAST(sum(obs) OVER () AS BIGINT) AS n,
       CAST(obs * (sum(obs) OVER ())
         - (sum(obs) OVER (PARTITION BY c_mktsegment))
           * (sum(obs) OVER (PARTITION BY o_orderpriority)) AS BIGINT)
         AS resid_num
     FROM o ORDER BY 1, 2"""

  /** q110: per-type activity trend — the exact OLS slope components of
    * daily event counts against the day index, per event type: is
    * each signal rising or falling, and how fast. Builds on the q93
    * one-pass moment pattern one level up: the fact table collapses to
    * (type, day) counts in one aggregation, and the regression sums
    * (n, Σx, Σy, Σxy, Σx²) over that metadata-scale table yield
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) as an exact integer
    * numerator/denominator pair — the monitoring query that pages
    * someone when error events trend up. x is days since the global
    * min day (broadcast 1-row agg), so the numbers are small and
    * engine-identical. */
  def trendQuery(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
    val origin = daily.agg(min(col("day")).as("d0"))
    daily.crossJoin(broadcast(origin))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_xx"))
      .withColumn("slope_num",
        col("n_days") * col("sum_xy") - col("sum_x") * col("sum_y"))
      .withColumn("slope_den",
        col("n_days") * col("sum_xx") - col("sum_x") * col("sum_x"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[trendQuery]]. */
  def trendOracleSql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
           count(*) AS y FROM events GROUP BY 1, 2),
       o AS (SELECT min(day) AS d0 FROM d),
       x AS (SELECT event_type, CAST(day - d0 AS BIGINT) AS x, y
             FROM d, o),
       s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(x) AS BIGINT) AS sum_x,
               CAST(sum(y) AS BIGINT) AS sum_y,
               CAST(sum(x * y) AS BIGINT) AS sum_xy,
               CAST(sum(x * x) AS BIGINT) AS sum_xx
             FROM x GROUP BY 1)
     SELECT event_type, n_days, sum_x, sum_y, sum_xy, sum_xx,
       n_days * sum_xy - sum_x * sum_y AS slope_num,
       n_days * sum_xx - sum_x * sum_x AS slope_den
     FROM s ORDER BY 1"""

  /** q111: frequency-of-frequencies — the Good-Turing N_k table: how
    * many distinct tokens occur exactly k times. Two stacked
    * aggregations (token counts, then count-of-counts), each with
    * map-side partial combine; the second input is vocabulary-sized.
    * The head of this table drives smoothing estimates (N_1/N is the
    * Good-Turing unseen-mass estimate) and its tail is the standard
    * corpus-health fingerprint (a missing hapax mass flags synthetic
    * or over-deduplicated text). Capped at the top [[FreqSpectrumCap]]
    * frequencies by count — the spectrum's useful head. */
  val FreqSpectrumCap = 30

  def freqSpectrumQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_terms"))
      .orderBy(col("k").asc)
      .limit(FreqSpectrumCap)

  /** DuckDB oracle for [[freqSpectrumQuery]]. */
  def freqSpectrumOracleSql: String =
    s"""WITH tk AS (SELECT unnest(string_split_regex(lower(trim(text)),
           '\\s+')) AS term FROM documents),
       c AS (SELECT term, count(*) AS k FROM tk GROUP BY 1)
     SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_terms
     FROM c GROUP BY 1 ORDER BY k LIMIT $FreqSpectrumCap"""

  /** q112: k-anonymity audit — for the quasi-identifier pair
    * (market segment, nation), every equivalence class smaller than
    * [[AnonK]] members, with its size: the privacy check a dataset
    * release runs BEFORE publication (classes this small re-identify
    * individuals when joined to outside data; the PII redaction in
    * `Redaction` masks direct identifiers, this catches the indirect
    * ones). One aggregation over the quasi-identifier key, then a
    * scan-side filter on the class size — the output is at most
    * |classes| rows, and the query costs one pass at any scale. */
  val AnonK = 40L

  def kAnonymityQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < AnonK)
      .select(col("c_mktsegment"), col("c_nationkey").cast("int"),
        col("class_size"))
      .orderBy("c_mktsegment", "c_nationkey")

  /** DuckDB oracle for [[kAnonymityQuery]]. */
  def kAnonymityOracleSql: String =
    s"""SELECT c_mktsegment, CAST(c_nationkey AS INT) AS c_nationkey,
         CAST(count(*) AS BIGINT) AS class_size
       FROM customer GROUP BY 1, 2 HAVING count(*) < $AnonK
       ORDER BY 1, 2"""

  /** Sensitive-attribute banding shared by the l-diversity and
    * t-closeness audits: the account balance in cents, shifted
    * non-negative (so integer division agrees across engines) and cut
    * into 4 fixed bands. The SQL twin is [[bandSql]]. */
  val AnonL = 3L
  private val bandExpr =
    "(cast(round(cast(c_acctbal as decimal(38,10)), 2) * 100 as bigint)" +
      " + 100000) div 275000"
  private val bandSql =
    "(CAST(round(CAST(c_acctbal AS DECIMAL(38,10)), 2) * 100 AS BIGINT)" +
      " + 100000) // 275000"

  /** q156: l-diversity audit — the k-anonymity follow-up (q112 finds
    * classes too SMALL; this finds classes too UNIFORM): a
    * quasi-identifier class with fewer than [[AnonL]] distinct
    * sensitive values tells an attacker who locates a member the
    * sensitive value (almost) outright, however large the class
    * (Machanavajjhala et al. 2007). Sensitive attribute: the banded
    * account balance. Same one-pass shape as q112 — one aggregation
    * over the quasi key, output bounded by |classes|. */
  def lDiversityQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr(bandExpr).as("band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col("band")).as("l_distinct"))
      .filter(col("l_distinct") < AnonL)
      .select(col("c_mktsegment"), col("c_nationkey").cast("int"),
        col("class_size"), col("l_distinct"))
      .orderBy("c_mktsegment", "c_nationkey")

  /** DuckDB oracle for [[lDiversityQuery]]. */
  def lDiversityOracleSql: String =
    s"""SELECT c_mktsegment, CAST(c_nationkey AS INT) AS c_nationkey,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT $bandSql) AS BIGINT) AS l_distinct
       FROM customer GROUP BY 1, 2
       HAVING count(DISTINCT $bandSql) < $AnonL
       ORDER BY 1, 2"""

  /** q157: t-closeness audit — the refinement past l-diversity: a
    * class can be diverse yet still LEAK by having a sensitive-value
    * DISTRIBUTION far from the corpus's (Li et al. 2007). Per
    * quasi-identifier class: the total-variation distance between the
    * class's band distribution and the global one, as an e6 integer
    * rational (per-band |p_class − p_global| via exact integer
    * division, summed, halved — the q123 drift-TVD arithmetic applied
    * per class). Every class is reported (the audit table), ordered.
    *
    * Scale shape: ONE corpus aggregation (class × band counts,
    * map-side combined) is the only pass over the table; class
    * sizes, the global band distribution, and the grand total are
    * all re-aggregations of that metadata-scale count table. The TVD
    * grid is |classes| × 4 bands, built by crossing class sizes with
    * the broadcast global distribution so absent bands still
    * contribute their |0 − p_global| term. */
  def tClosenessQuery(spark: SparkSession, dir: String): DataFrame = {
    val classBand = Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        expr(bandExpr).as("band"))
      .groupBy("c_mktsegment", "c_nationkey", "band")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val classSize = classBand.groupBy("c_mktsegment", "c_nationkey")
      .agg(sum(col("cnt")).as("class_size"))
    val globalBand = classBand.groupBy("band")
      .agg(sum(col("cnt")).as("gcnt"))
    val total = classBand.agg(sum(col("cnt")).as("total"))
    classSize.crossJoin(broadcast(globalBand.crossJoin(total)))
      .join(classBand, Seq("c_mktsegment", "c_nationkey", "band"), "left")
      .select(col("c_mktsegment"), col("c_nationkey"), col("class_size"),
        abs(expr("coalesce(cnt, 0) * 1000000 div class_size") -
          expr("gcnt * 1000000 div total")).as("term"))
      .groupBy("c_mktsegment", "c_nationkey", "class_size")
      .agg(expr("sum(term) div 2").as("tvd_e6"))
      .select(col("c_mktsegment"), col("c_nationkey").cast("int"),
        col("class_size"), col("tvd_e6"))
      .orderBy("c_mktsegment", "c_nationkey")
  }

  /** DuckDB oracle for [[tClosenessQuery]]. */
  def tClosenessOracleSql: String =
    s"""WITH banded AS (SELECT c_mktsegment, c_nationkey,
           $bandSql AS band FROM customer),
       cb AS (SELECT c_mktsegment, c_nationkey, band, count(*) AS cnt
              FROM banded GROUP BY 1, 2, 3),
       cs AS (SELECT c_mktsegment, c_nationkey, count(*) AS class_size
              FROM banded GROUP BY 1, 2),
       gb AS (SELECT band, count(*) AS gcnt FROM banded GROUP BY 1),
       t AS (SELECT count(*) AS total FROM banded),
       grid AS (SELECT cs.c_mktsegment, cs.c_nationkey, cs.class_size,
           abs(coalesce(cb.cnt, 0) * 1000000 // cs.class_size
               - gb.gcnt * 1000000 // t.total) AS term
         FROM cs CROSS JOIN gb CROSS JOIN t
         LEFT JOIN cb ON cb.c_mktsegment = cs.c_mktsegment
           AND cb.c_nationkey = cs.c_nationkey AND cb.band = gb.band)
     SELECT c_mktsegment, CAST(c_nationkey AS INT) AS c_nationkey,
       CAST(class_size AS BIGINT) AS class_size,
       CAST(sum(term) // 2 AS BIGINT) AS tvd_e6
     FROM grid GROUP BY 1, 2, 3 ORDER BY 1, 2"""

  /** q163: Gini concentration of customer revenue — the inequality
    * audit beside the HHI (q140 measures supplier concentration per
    * part; this measures how unevenly revenue spreads over the whole
    * customer base, the "do 20% of customers carry 80% of revenue"
    * number). Rank formula G = (2·Σ rn·xᵢ − (n+1)·Σx) / (n·Σx) over
    * ascending-ranked revenues — exact integer end to end: cents via
    * [[decSumCents]], ranks via the distributed [[globalRankAsc]]
    * (blocked two-phase, no single-partition fact window), moments in
    * DECIMAL(38,0), one e6 floor division at the end. Tie order
    * cannot perturb the sum (equal x swap ranks freely), so the
    * cross-engine rank tie-break is load-bearing only for
    * reproducibility, not the value. Every moment that multiplies n by
    * s runs in DECIMAL(38,0) — a LongType product n·s wraps silently
    * under non-ANSI semantics at the 100 TB design point while the
    * oracle's HUGEINT does not, exactly the divergence the decimal
    * accumulation of w already guards against. */
  def giniQuery(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(decSumCents(col("o_totalprice")).as("cents"))
      .select(col("o_custkey").as("id"), col("cents"))
    globalRankAsc(rev, blockWidth = 1000000L)
      .agg(count(lit(1)).as("n"),
        expr("sum(CAST(cents AS DECIMAL(38,0)))").as("s"),
        expr("sum(CAST(rn AS DECIMAL(38,0)) * cents)").as("w"))
      .select(col("n").as("n_customers"),
        col("s").cast("long").as("total_cents"),
        expr("""CAST((2 * w - (CAST(n AS DECIMAL(38,0)) + 1) * s)
                * 1000000 div (CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)""")
          .as("gini_e6"))
      .orderBy("n_customers")
  }

  /** DuckDB oracle for [[giniQuery]]. */
  def giniOracleSql: String =
    """WITH rev AS (SELECT o_custkey,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 2) * 100
                AS BIGINT) AS cents
         FROM orders GROUP BY 1),
       r AS (SELECT cents,
           row_number() OVER (ORDER BY cents, o_custkey) AS rn FROM rev),
       a AS (SELECT count(*) AS n, sum(cents) AS s,
           sum(rn * cents) AS w FROM r)
     SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(s AS BIGINT) AS total_cents,
       CAST((2 * w - (n + 1) * s) * 1000000 // (n * s) AS BIGINT)
         AS gini_e6
     FROM a ORDER BY n_customers"""

  /** q113: incremental materialized-view maintenance — a monthly
    * revenue aggregate kept up to date by MERGING PARTIALS instead of
    * recomputing: the "base" view (orders before [[IvmCutover]]) and
    * the "delta" batch (orders at/after it) are each aggregated
    * independently, then combined by summing partial counts and
    * partial cents per group — the algebraic-aggregate property that
    * makes incremental view maintenance correct, executed explicitly.
    * The oracle computes the view DIRECTLY over all orders, so the
    * hash match IS the proof that partial-merge == full recompute.
    * At scale the base partials are a stored table and only the delta
    * touches new data — the nightly-load pattern. */
  val IvmCutover = "1997-01-01"

  def ivmQuery(spark: SparkSession, dir: String): DataFrame = {
    def partial(df: DataFrame): DataFrame = df
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        decSumCents(col("o_totalprice")).as("cents"))
    val orders = Tables.orders(spark, dir)
    val base = partial(orders.filter(col("o_orderdate") < lit(IvmCutover)))
    val delta = partial(orders.filter(col("o_orderdate") >= lit(IvmCutover)))
    base.unionByName(delta)
      .groupBy("month", "o_orderstatus")
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("cents")).as("cents"))
      .orderBy("month", "o_orderstatus")
  }

  /** DuckDB oracle for [[ivmQuery]] — the DIRECT full recompute the
    * partial-merge must equal. */
  def ivmOracleSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 2) * 100
           AS BIGINT) AS cents
       FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Deleted-slice selector for [[ivmRetractQuery]]: base rows whose
    * key ≡ 0 mod 13 are later retracted (cancelled orders). */
  val IvmDeleteMod = 13L

  /** q191: incremental view maintenance under RETRACTIONS — q113
    * handles an append-only delta; real changelogs also carry
    * deletes. The algebra: every change is a signed multiplicity
    * (+1 insert, −1 delete), the delta aggregate sums mult and
    * mult·cents per group, the merge adds it onto the stored base
    * partials, and groups whose maintained count reaches zero are
    * DROPPED (the retraction-completeness rule — a zero-count group
    * must vanish, not linger with zeroed sums). The oracle computes
    * the view directly over the post-change data, so the hash match
    * proves base ⊕ signed-delta == full recompute, deletes included.
    *
    * Cents are fixed per ROW (round(decimal(x), 2)·100 — exact for
    * 2-decimal prices) so a signed integer sum is exact and the
    * delete's −cents exactly cancels the insert's +cents; a
    * sum-then-round would make retraction inexact under fp error.
    * Scale shape: base partials are a stored metadata-scale table;
    * only the changelog is aggregated (one keyed shuffle) and the
    * merge joins two partial tables, never the data. */
  def ivmRetractQuery(spark: SparkSession, dir: String): DataFrame = {
    val rowCents = expr(
      "CAST(round(CAST(o_totalprice AS DECIMAL(38,10)), 2) * 100 AS BIGINT)")
    val orders = Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus"), col("o_orderkey"), rowCents.as("cents"))
    val isBase = col("month") < lit(IvmCutover.substring(0, 7))
    // stored view: partials over the pre-cutover load
    val base = orders.filter(isBase)
      .groupBy("month", "o_orderstatus")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("cents")).as("c"))
    // changelog: post-cutover inserts plus retractions of cancelled
    // base rows, one signed frame
    val changes = orders.filter(!isBase).withColumn("mult", lit(1L))
      .unionByName(orders.filter(isBase &&
        pmod(col("o_orderkey"), lit(IvmDeleteMod)) === 0)
        .withColumn("mult", lit(-1L)))
    val delta = changes.groupBy("month", "o_orderstatus")
      .agg(sum(col("mult")).as("n"),
        sum(col("mult") * col("cents")).as("c"))
    base.unionByName(delta)
      .groupBy("month", "o_orderstatus")
      .agg(sum(col("n")).cast("long").as("n_orders"),
        sum(col("c")).cast("long").as("cents"))
      .filter(col("n_orders") =!= 0)
      .orderBy("month", "o_orderstatus")
  }

  /** DuckDB oracle for [[ivmRetractQuery]] — the view recomputed
    * directly over the post-change table (all orders minus the
    * retracted slice). */
  def ivmRetractOracleSql: String =
    s"""WITH live AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
           o_orderstatus,
           CAST(round(CAST(o_totalprice AS DECIMAL(38,10)), 2) * 100
             AS BIGINT) AS cents
         FROM orders
         WHERE NOT (strftime(o_orderdate, '%Y-%m') < '${IvmCutover
            .substring(0, 7)}' AND o_orderkey % $IvmDeleteMod = 0))
     SELECT month, o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS cents
     FROM live GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q114: min-max feature scaling — event values rescaled to
    * [0, 1e6] within their event-type stratum, as exact integer
    * rationals: scaled_e6 = (x − min)·1e6 div (max − min). The
    * ML-prep normalization pass: per-stratum bounds come from ONE
    * aggregation (map-side combined) and broadcast back onto the
    * stream, so the transform is scan-shaped at any scale. The
    * registered output keeps a deterministic 1-in-97 key sample of
    * the scaled rows (sampled AFTER scaling, so the bounds reflect
    * the full data); constant strata scale to 0 by convention. */
  def minMaxScaleQuery(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.events(spark, dir)
      .filter(!isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
    val bounds = vals.groupBy("event_type")
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    vals.join(broadcast(bounds), Seq("event_type"))
      .withColumn("scaled_e6",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(expr("(cents - lo) * 1000000 div (hi - lo)")))
      .filter(col("event_id") % 97 === 0)
      .select(col("event_type"), col("event_id"), col("cents"),
        col("scaled_e6"))
      .orderBy("event_type", "event_id")
  }

  /** DuckDB oracle for [[minMaxScaleQuery]]. */
  def minMaxScaleOracleSql: String =
    """WITH v AS (SELECT event_type, event_id,
           CAST(floor(value * 100) AS BIGINT) AS cents
         FROM events WHERE NOT isnan(value) AND isfinite(value)),
       b AS (SELECT event_type, min(cents) AS lo, max(cents) AS hi
             FROM v GROUP BY 1)
     SELECT v.event_type, v.event_id, v.cents,
       CASE WHEN b.hi = b.lo THEN 0
            ELSE (v.cents - b.lo) * 1000000 // (b.hi - b.lo) END
         AS scaled_e6
     FROM v JOIN b USING (event_type)
     WHERE v.event_id % 97 = 0
     ORDER BY 1, 2"""

  /** q117: percent-of-parent hierarchical shares — revenue rolled up
    * the region → nation hierarchy with each nation's share of its
    * region and each region's share of the total, as exact integer
    * rationals. The fact table collapses to per-nation cents in one
    * aggregation (the only fact-sized shuffle); the hierarchy math is
    * window sums over the |nations|-row table joined to the broadcast
    * dimensions. The drill-down report every BI layer renders — here
    * it is one declarative plan. */
  def parentShareQuery(spark: SparkSession, dir: String): DataFrame = {
    val natRev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .groupBy("c_nationkey")
      .agg(decSumCents(col("o_totalprice")).as("cents"))
    val dims = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nationkey"), col("n_name"),
        col("n_regionkey"))
      .join(Tables.region(spark, dir)
        .select(col("r_regionkey").as("n_regionkey"), col("r_name")),
        Seq("n_regionkey"))
    val byRegion = Window.partitionBy("r_name")
    val all = Window.partitionBy()
    natRev.join(broadcast(dims), Seq("c_nationkey"))
      .withColumn("region_cents", sum(col("cents")).over(byRegion))
      .withColumn("total_cents", sum(col("cents")).over(all))
      .select(col("r_name"), col("n_name"), col("cents"),
        expr("CAST(cents AS DECIMAL(38,0)) * 1000000 div region_cents")
          .cast("long").as("share_of_region_e6"),
        expr("CAST(region_cents AS DECIMAL(38,0)) * 1000000 div total_cents")
          .cast("long").as("region_share_e6"))
      .orderBy("r_name", "n_name")
  }

  /** DuckDB oracle for [[parentShareQuery]]. */
  def parentShareOracleSql: String =
    """WITH nr AS (SELECT c.c_nationkey,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(38,10))), 2)
             * 100 AS BIGINT) AS cents
         FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         GROUP BY 1),
       d AS (SELECT nr.cents, n.n_name, r.r_name
             FROM nr JOIN nation n ON n.n_nationkey = nr.c_nationkey
               JOIN region r ON r.r_regionkey = n.n_regionkey),
       w AS (SELECT r_name, n_name, cents,
               sum(cents) OVER (PARTITION BY r_name) AS region_cents,
               sum(cents) OVER () AS total_cents FROM d)
     SELECT r_name, n_name, cents,
       CAST(cents * 1000000 // region_cents AS BIGINT)
         AS share_of_region_e6,
       CAST(region_cents * 1000000 // total_cents AS BIGINT)
         AS region_share_e6
     FROM w ORDER BY r_name, n_name"""

  /** q118: cumulative distribution over the q94 histogram — running
    * order counts and cumulative share per equi-width bin (the CDF
    * companion the histogram feeds: "what fraction of orders sit at or
    * below this price"). The running sum is a frame window over the
    * BIN table — metadata-scale, single partition by design and
    * documented as such, because it runs over tens of rows after the
    * fact table has already collapsed. */
  def histogramCdfQuery(spark: SparkSession, dir: String): DataFrame = {
    val bins = histogramQuery(spark, dir)
    val running = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    bins
      .withColumn("cum_orders", sum(col("n_orders")).over(running))
      .withColumn("total", sum(col("n_orders")).over(all))
      .select(col("bin"), col("lo_cents"), col("hi_cents"),
        col("n_orders"), col("cum_orders"),
        expr("cum_orders * 1000000 div total").as("cum_share_e6"))
      .orderBy("bin")
  }

  /** DuckDB oracle for [[histogramCdfQuery]]. */
  def histogramCdfOracleSql: String =
    s"""WITH b AS (SELECT CAST(round(CAST(o_totalprice AS
             DECIMAL(38,10)), 2) * 100 AS BIGINT) // $HistBinCents
             AS bin FROM orders),
       c AS (SELECT bin, count(*) AS n FROM b GROUP BY 1),
       s AS (SELECT unnest(generate_series((SELECT min(bin) FROM b),
               (SELECT max(bin) FROM b))) AS bin),
       h AS (SELECT s.bin, s.bin * $HistBinCents AS lo_cents,
               (s.bin + 1) * $HistBinCents - 1 AS hi_cents,
               CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
             FROM s LEFT JOIN c USING (bin)),
       w AS (SELECT *, CAST(sum(n_orders) OVER (ORDER BY bin) AS BIGINT)
               AS cum_orders,
               CAST(sum(n_orders) OVER () AS BIGINT) AS total FROM h)
     SELECT bin, lo_cents, hi_cents, n_orders, cum_orders,
       cum_orders * 1000000 // total AS cum_share_e6
     FROM w ORDER BY bin"""

  /** q119: weighted median — per language, the document length at
    * which HALF THE TOKEN MASS sits in shorter documents (the "median
    * document" a reader of the corpus actually experiences, vs the
    * count-median that over-weights stubs). Rule: the smallest value v
    * with 2·cumweight(v) ≥ total. The cumulative weight is the
    * two-phase prefix-sum shape AGAIN (in-block running sums within
    * (lang, length-block) windows + metadata-scale block offsets), so
    * no stratum ever sorts in one partition. */
  def weightedMedianQuery(spark: SparkSession, dir: String): DataFrame = {
    // tokenize once: offsets, totals, and the ranked pass all read
    // this narrow (lang, id, v, w) frame — without the checkpoint each
    // branch re-tokenizes the corpus for the weight column
    val rows = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id").as("id"),
        col("n_chars").as("v"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("w"))
      .withColumn("block", expr("v div 1000"))
      .localCheckpoint()
    val blockW = Window.partitionBy("lang").orderBy(col("block").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy("lang", "block")
      .agg(sum(col("w")).as("bw"))
      .withColumn("offset", coalesce(sum(col("bw")).over(blockW), lit(0L)))
      .select("lang", "block", "offset")
    val totals = rows.groupBy("lang").agg(sum(col("w")).as("tw"))
    val inBlock = Window.partitionBy("lang", "block")
      .orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("cw_local", sum(col("w")).over(inBlock))
      .join(broadcast(offsets), Seq("lang", "block"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("cumw", col("offset") + col("cw_local"))
      .filter(col("cumw") * 2 >= col("tw"))
      .groupBy("lang")
      .agg(max(col("tw")).as("total_tokens"),
        min(col("v")).as("median_chars"))
      .orderBy("lang")
  }

  /** DuckDB oracle for [[weightedMedianQuery]] — one window per
    * stratum (fine at oracle scale), identical median rule. */
  def weightedMedianOracleSql: String =
    """WITH r AS (SELECT lang, doc_id AS id, n_chars AS v,
           CAST(len(string_split_regex(trim(lower(text)), '\s+'))
             AS BIGINT) AS w
         FROM documents),
       c AS (SELECT lang, v, w,
               sum(w) OVER (PARTITION BY lang ORDER BY v, id) AS cumw,
               sum(w) OVER (PARTITION BY lang) AS tw FROM r)
     SELECT lang, CAST(max(tw) AS BIGINT) AS total_tokens,
       CAST(min(v) AS BIGINT) AS median_chars
     FROM c WHERE cumw * 2 >= tw GROUP BY 1 ORDER BY 1"""

  /** Probe quantiles (percent) for [[weightedQuantilesQuery]]. */
  val WeightedProbes: Seq[Int] = Seq(25, 50, 75, 90)

  /** q196: weighted quantiles per stratum — q119's weighted median
    * generalized to a probe set: the q-th weighted quantile is the
    * least value whose cumulative weight reaches q% of the stratum
    * total (token-weighted char-length quantiles per language — the
    * curation diagnostic "how long are the docs that carry our
    * tokens"). Same blocked cumulative-weight machinery as q119
    * (in-block window + broadcast block offsets — never a stratum-
    * wide sort at scale); the probe fan-out is a broadcast
    * non-equi join, and each (stratum, probe) group reduces by
    * min(v) with map-side combine. All integer arithmetic. */
  def weightedQuantilesQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id").as("id"),
        col("n_chars").as("v"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("w"))
      .withColumn("block", expr("v div 1000"))
      .localCheckpoint()
    val blockW = Window.partitionBy("lang").orderBy(col("block").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy("lang", "block")
      .agg(sum(col("w")).as("bw"))
      .withColumn("offset", coalesce(sum(col("bw")).over(blockW), lit(0L)))
      .select("lang", "block", "offset")
    val totals = rows.groupBy("lang").agg(sum(col("w")).as("tw"))
    val inBlock = Window.partitionBy("lang", "block")
      .orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val probes = WeightedProbes.toDF("q_pct")
    rows
      .withColumn("cw_local", sum(col("w")).over(inBlock))
      .join(broadcast(offsets), Seq("lang", "block"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("cumw", col("offset") + col("cw_local"))
      .join(broadcast(probes),
        col("cumw") * 100 >= col("q_pct") * col("tw"))
      .groupBy("lang", "q_pct")
      .agg(max(col("tw")).cast("long").as("total_w"),
        min(col("v")).cast("long").as("q_chars"))
      .orderBy("lang", "q_pct")
  }

  /** DuckDB oracle for [[weightedQuantilesQuery]] — one window per
    * stratum (fine at oracle scale), identical quantile rule. */
  def weightedQuantilesOracleSql: String = {
    val probeRows = WeightedProbes.map(p => s"($p)").mkString(", ")
    s"""WITH r AS (SELECT lang, doc_id AS id, n_chars AS v,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
             AS BIGINT) AS w
         FROM documents),
       c AS (SELECT lang, v, w,
               sum(w) OVER (PARTITION BY lang ORDER BY v, id) AS cumw,
               sum(w) OVER (PARTITION BY lang) AS tw FROM r),
       probes(q_pct) AS (VALUES $probeRows)
     SELECT lang, CAST(q_pct AS INT) AS q_pct,
       CAST(max(tw) AS BIGINT) AS total_w,
       CAST(min(v) AS BIGINT) AS q_chars
     FROM c JOIN probes ON cumw * 100 >= q_pct * tw
     GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** q120: market-basket pair mining — the most co-ordered part pairs
    * (the support table behind "frequently bought together" and the
    * first A-priori level). Baskets are deduped to distinct (order,
    * part) FIRST, capped at [[BasketCap]] items (the hot-group rule:
    * a pathological mega-order would otherwise emit quadratic pairs),
    * and pairs come from a self-join keyed on the order — each
    * shuffle partition holds whole baskets, so pair generation is
    * local and bounded by cap² per basket. */
  val BasketCap = 15L

  def basketPairsQuery(spark: SparkSession, dir: String,
      topN: Int = 20): DataFrame =
    basketPairs(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")), topN)

  /** [[basketPairsQuery]] over an explicit (l_orderkey, l_partkey)
    * frame — the testable capped core (a planted mega-order must be
    * pruned BEFORE the self-join, see BoundedScaleSpec). */
  def basketPairs(rawItems: DataFrame, topN: Int): DataFrame = {
    val items = rawItems.select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val sized = items.groupBy("l_orderkey")
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= BasketCap)
      .select("l_orderkey")
    // both self-join sides read the capped-basket table — checkpoint
    // it (q136's basketLiftQuery already does; this is the same table)
    val kept = items.join(sized, Seq("l_orderkey")).localCheckpoint()
    kept.as("a").join(kept.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("p1").asc, col("p2").asc)
      .limit(topN)
  }

  /** q136: basket lift — the q120 pair supports normalized into
    * association lift: support(p1,p2)·N·1e6 div (s(p1)·s(p2)), lift
    * > 1e6 meaning the pair co-occurs more than independence
    * predicts (the actual recommendation signal; raw support just
    * finds popular items). Item supports ride the same capped-basket
    * table; the lift arithmetic joins two broadcast item-support
    * copies onto the pair table. Decimal intermediates: support·N·1e6
    * outgrows a long at warehouse scale. Registered as the top
    * [[DispersionTopN]] by lift among pairs with support ≥ 3 (rare
    * pairs produce degenerate lifts). */
  def basketLiftQuery(spark: SparkSession, dir: String,
      topN: Int = 20): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val sized = items.groupBy("l_orderkey")
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= BasketCap)
      .select("l_orderkey")
    // four plan branches (basket count, item supports, both pair
    // sides) read the capped-basket table — checkpoint it once
    // instead of re-running the distinct + cap subtree per branch
    val kept = items.join(sized, Seq("l_orderkey")).localCheckpoint()
    val nBaskets = kept.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val support = kept.groupBy(col("l_partkey")).agg(count(lit(1)).as("s"))
    val pairs = kept.as("a").join(kept.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 3)
    pairs
      .join(broadcast(support.select(col("l_partkey").as("p1"),
        col("s").as("s1"))), Seq("p1"))
      .join(broadcast(support.select(col("l_partkey").as("p2"),
        col("s").as("s2"))), Seq("p2"))
      .crossJoin(broadcast(nBaskets))
      .select(col("p1"), col("p2"), col("support"),
        expr("""CAST(support AS DECIMAL(38,0)) * n_baskets * 1000000
                div (s1 * s2)""").cast("long").as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("p1").asc, col("p2").asc)
      .limit(topN)
  }

  /** DuckDB oracle for [[basketLiftQuery]] (support ≥ 3, top 20). */
  def basketLiftOracleSql: String =
    s"""WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       keep AS (SELECT l_orderkey FROM it GROUP BY 1
                HAVING count(*) <= $BasketCap),
       k AS (SELECT it.* FROM it JOIN keep USING (l_orderkey)),
       nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM k),
       sup AS (SELECT l_partkey, count(*) AS s FROM k GROUP BY 1),
       p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               count(*) AS support
             FROM k a JOIN k b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING count(*) >= 3)
     SELECT p.p1, p.p2, CAST(p.support AS BIGINT) AS support,
       CAST(p.support * nb.n_baskets * 1000000 // (s1.s * s2.s)
         AS BIGINT) AS lift_e6
     FROM p JOIN sup s1 ON s1.l_partkey = p.p1
       JOIN sup s2 ON s2.l_partkey = p.p2
       CROSS JOIN nb
     ORDER BY lift_e6 DESC, p1, p2 LIMIT 20"""

  /** DuckDB oracle for [[basketPairsQuery]] (top 20). */
  def basketPairsOracleSql: String =
    s"""WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       keep AS (SELECT l_orderkey FROM it GROUP BY 1
                HAVING count(*) <= $BasketCap),
       k AS (SELECT it.* FROM it JOIN keep USING (l_orderkey))
     SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(count(*) AS BIGINT) AS support
     FROM k a JOIN k b ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey < b.l_partkey
     GROUP BY 1, 2 ORDER BY support DESC, p1, p2 LIMIT 20"""

  /** q121: sequence-contiguity audit — per order, the line numbers
    * must run 1..n with no gaps or duplicates (the dbt-style
    * structural test generalized to sequences; min==1 ∧ max==n ∧
    * distinct==n is equivalent to contiguity). One aggregation over
    * the order key; the report is a single row of totals so a 100 TB
    * audit ships one number back. */
  def contiguityQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("l_linenumber")).as("nd"),
        min(col("l_linenumber")).as("mn"),
        max(col("l_linenumber")).as("mx"))
      .select(when(col("mn") === 1 && col("mx") === col("n") &&
        col("nd") === col("n"), 0L).otherwise(1L).as("bad"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("bad")).as("n_violations"))

  /** DuckDB oracle for [[contiguityQuery]]. */
  def contiguityOracleSql: String =
    """WITH g AS (SELECT l_orderkey, count(*) AS n,
           count(DISTINCT l_linenumber) AS nd,
           min(l_linenumber) AS mn, max(l_linenumber) AS mx
         FROM lineitem GROUP BY 1)
     SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN mn = 1 AND mx = n AND nd = n
         THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
     FROM g"""

  /** q128: price-dispersion screening — the parts whose line-item
    * prices vary most, measured as relative spread (max − min)·1e6
    * div min over exact cents: the pricing-anomaly screen (a part
    * selling at 3× its own floor is either a data error or a revenue
    * story). One part-keyed min/max aggregation (map-side combined),
    * a scan-side spread computation, and a TakeOrderedAndProject for
    * the top [[DispersionTopN]] — nothing global ever sorts. */
  val DispersionTopN = 20

  def priceDispersionQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        (round(col("l_extendedprice").cast("decimal(38,10)"), 2) * 100)
          .cast("long").as("cents"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_lines"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .filter(col("n_lines") >= 2 && col("min_cents") > 0)
      .withColumn("spread_e6",
        expr("(max_cents - min_cents) * 1000000 div min_cents"))
      .orderBy(col("spread_e6").desc, col("l_partkey").asc)
      .limit(DispersionTopN)

  /** DuckDB oracle for [[priceDispersionQuery]] (top 20). */
  def priceDispersionOracleSql: String =
    s"""WITH c AS (SELECT l_partkey,
           CAST(round(CAST(l_extendedprice AS DECIMAL(38,10)), 2) * 100
             AS BIGINT) AS cents FROM lineitem),
       g AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
               min(cents) AS min_cents, max(cents) AS max_cents
             FROM c GROUP BY 1)
     SELECT l_partkey, n_lines, min_cents, max_cents,
       (max_cents - min_cents) * 1000000 // min_cents AS spread_e6
     FROM g WHERE n_lines >= 2 AND min_cents > 0
     ORDER BY spread_e6 DESC, l_partkey LIMIT $DispersionTopN"""

  /** q131: Pareto / ABC classification — parts bucketed A/B/C by
    * cumulative revenue share (A carries the first 80%, B to 95%, C
    * the tail): the inventory-policy classifier, and at corpus scale
    * the "which sources carry the value" triage. The part-revenue
    * table ranks DESC with the two-phase blocked rank; the cumulative
    * share needs a running sum over that same ordering, which rides
    * the identical block decomposition (in-block running sums + block
    * offsets) — nothing fact-sized sorts in one partition. Class
    * boundaries compare floor shares (×1e6), so the cut is exact. */
  def paretoQuery(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        (round(col("l_extendedprice").cast("decimal(38,10)"), 2) * 100)
          .cast("long").as("c"))
      .groupBy("l_partkey").agg(sum(col("c")).as("rev"))
    // descending blocked decomposition: block by NEGATED revenue so
    // the ascending block machinery yields a descending global order.
    // Checkpointed: offsets, total, and the running-sum pass all read
    // it, and each re-run would repeat the per-part corpus aggregation.
    val r = rev.withColumn("block", expr("(-rev) div 10000000"))
      .localCheckpoint()
    val bt = r.groupBy("block").agg(sum(col("rev")).as("brev"))
    val offsets = blockOffsets(bt, "block", descending = false,
        Seq(("brev", "sum", "cum_before")))
      .select(col("block"),
        coalesce(col("cum_before"), lit(0L)).as("cum_before"))
    val total = bt.agg(sum(col("brev")).as("total"))
    val inBlock = Window.partitionBy("block")
      .orderBy(col("rev").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.withColumn("cum_local", sum(col("rev")).over(inBlock))
      .join(broadcast(offsets), "block")
      .crossJoin(broadcast(total))
      .withColumn("cum_share_e6",
        expr("(cum_before + cum_local) * 1000000 div total"))
      .withColumn("clazz",
        when(col("cum_share_e6") <= 800000L, "A")
          .when(col("cum_share_e6") <= 950000L, "B").otherwise("C"))
      .groupBy("clazz")
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("rev_cents"))
      .orderBy("clazz")
  }

  /** DuckDB oracle for [[paretoQuery]] — one global running sum (fine
    * at oracle scale), identical boundaries. */
  def paretoOracleSql: String =
    """WITH rev AS (SELECT l_partkey,
           CAST(sum(CAST(round(CAST(l_extendedprice AS DECIMAL(38,10)),
             2) * 100 AS BIGINT)) AS BIGINT) AS rev
         FROM lineitem GROUP BY 1),
       c AS (SELECT l_partkey, rev,
               sum(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum,
               sum(rev) OVER () AS total FROM rev),
       k AS (SELECT rev,
               CASE WHEN cum * 1000000 // total <= 800000 THEN 'A'
                    WHEN cum * 1000000 // total <= 950000 THEN 'B'
                    ELSE 'C' END AS clazz
             FROM c)
     SELECT clazz, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS rev_cents
     FROM k GROUP BY 1 ORDER BY 1"""

  /** q133: weekday × hour activity heatmap — event counts over the
    * COMPLETE 7×24 grid, zero-filled (the ops-dashboard heatmap; the
    * missing cells are the signal when a region goes quiet). The fact
    * table collapses to at most 168 cells in one aggregation; the
    * spine is a literal cross of two tiny sequences. ISO weekday
    * numbering pinned explicitly — engines disagree on week start, so
    * the query uses its own dow arithmetic from the epoch day. */
  def heatmapQuery(spark: SparkSession, dir: String): DataFrame = {
    // epoch day 0 = 1970-01-01 = Thursday; iso dow: Mon=1..Sun=7
    val counts = Tables.events(spark, dir)
      .select(
        expr("(unix_millis(ts) div 86400000 + 3) % 7 + 1").as("iso_dow"),
        hour(col("ts")).cast("long").as("h"))
      .groupBy("iso_dow", "h").agg(count(lit(1)).as("n_events"))
    val spine = spark.range(1, 8).toDF("iso_dow")
      .crossJoin(spark.range(0, 24).toDF("h"))
    spine.join(counts, Seq("iso_dow", "h"), "left")
      .select(col("iso_dow"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("iso_dow", "h")
  }

  /** DuckDB oracle for [[heatmapQuery]]. */
  def heatmapOracleSql: String =
    """WITH c AS (SELECT
           (epoch_ms(ts) // 86400000 + 3) % 7 + 1 AS iso_dow,
           CAST(date_part('hour', ts) AS BIGINT) AS h,
           count(*) AS n FROM events GROUP BY 1, 2),
       s AS (SELECT d.iso_dow, h.h
             FROM (SELECT unnest(generate_series(1, 7)) AS iso_dow) d,
                  (SELECT unnest(generate_series(0, 23)) AS h) h)
     SELECT CAST(s.iso_dow AS BIGINT) AS iso_dow,
       CAST(s.h AS BIGINT) AS h,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
     FROM s LEFT JOIN c ON c.iso_dow = s.iso_dow AND c.h = s.h
     ORDER BY 1, 2"""

  /** q137: lag-1 autocorrelation components of the daily count series
    * per event type — the exact integer sums (n, Σy_t, Σy_{t−1},
    * Σy_t·y_{t−1}, Σy_t², Σy_{t−1}²) over consecutive-day pairs, from
    * which r₁ is driver-side arithmetic: the "is today like
    * yesterday" seasonality probe that complements the q110 trend.
    * The series collapses to |types|×|days| rows first; the lag pairs
    * come from a self-join on day+1 within each type (equi-keyed, no
    * window needed), and only CONSECUTIVE days pair — gaps simply
    * contribute no pair, which the oracle reproduces exactly. */
  def autocorrQuery(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
    val a = daily.select(col("event_type"), col("day"), col("y").as("yt"))
    val b = daily.select(col("event_type"),
      date_add(col("day"), 1).as("day"), col("y").as("yp"))
    a.join(b, Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("yt")).as("sum_t"), sum(col("yp")).as("sum_p"),
        sum(col("yt") * col("yp")).as("sum_tp"),
        sum(col("yt") * col("yt")).as("sum_tt"),
        sum(col("yp") * col("yp")).as("sum_pp"))
      .orderBy("event_type")
  }

  /** DuckDB oracle for [[autocorrQuery]]. */
  def autocorrOracleSql: String =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
           count(*) AS y FROM events GROUP BY 1, 2),
       j AS (SELECT a.event_type, a.y AS yt, b.y AS yp
             FROM d a JOIN d b ON b.event_type = a.event_type
               AND b.day + 1 = a.day)
     SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(yt) AS BIGINT) AS sum_t,
       CAST(sum(yp) AS BIGINT) AS sum_p,
       CAST(sum(yt * yp) AS BIGINT) AS sum_tp,
       CAST(sum(yt * yt) AS BIGINT) AS sum_tt,
       CAST(sum(yp * yp) AS BIGINT) AS sum_pp
     FROM j GROUP BY 1 ORDER BY 1"""

  /** q139: RFM segmentation — every customer scored 1-3 on Recency
    * (days since last order), Frequency (order count), and Monetary
    * (total spend), then the population of each of the 27 RFM cells:
    * the classic CRM segmentation, built from three DISTRIBUTED
    * tercile ranks over the customer-profile table ([[globalRankAsc]]
    * per dimension — the fact table collapsed to one row per customer
    * first, so the ranks never see order cardinality). Recency ranks
    * DESC (most recent = 3) by negating the age; ties everywhere
    * break on the customer key, making every cell assignment
    * deterministic. */
  def rfmQuery(spark: SparkSession, dir: String): DataFrame = {
    val maxDay = Tables.orders(spark, dir)
      .agg(max(to_date(col("o_orderdate"))).as("max_day"))
    val profile = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("id"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        decSumCents(col("o_totalprice")).as("spend"))
      .crossJoin(broadcast(maxDay))
      .withColumn("age_days",
        datediff(col("max_day"), col("last_day")).cast("long"))
      .localCheckpoint() // three rank branches read this profile
    val tr = globalRankAsc(profile.select(col("id"),
        (-col("age_days")).as("cents")), 1000000L)
      .select(col("id"), (expr("(rn - 1) * 3 div n_total").cast("int") + 1)
        .as("r_score"))
    val tf = globalRankAsc(profile.select(col("id"),
        col("freq").as("cents")), 1000000L)
      .select(col("id"), (expr("(rn - 1) * 3 div n_total").cast("int") + 1)
        .as("f_score"))
    val tm = globalRankAsc(profile.select(col("id"),
        col("spend").as("cents")), 1000000L)
      .select(col("id"), (expr("(rn - 1) * 3 div n_total").cast("int") + 1)
        .as("m_score"))
    tr.join(tf, Seq("id")).join(tm, Seq("id"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** DuckDB oracle for [[rfmQuery]] — single global windows per
    * dimension, identical tercile arithmetic. */
  def rfmOracleSql: String =
    """WITH p AS (SELECT o_custkey AS id,
           max(CAST(o_orderdate AS DATE)) AS last_day,
           count(*) AS freq,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))), 2) * 100
             AS BIGINT) AS spend
         FROM orders GROUP BY 1),
       m AS (SELECT max(last_day) AS max_day FROM p),
       x AS (SELECT id, freq, spend,
               -CAST(m.max_day - p.last_day AS BIGINT) AS neg_age
             FROM p, m),
       tr AS (SELECT id, CAST((row_number() OVER (ORDER BY neg_age, id)
                - 1) * 3 // count(*) OVER () AS INT) + 1 AS r_score
              FROM x),
       tf AS (SELECT id, CAST((row_number() OVER (ORDER BY freq, id)
                - 1) * 3 // count(*) OVER () AS INT) + 1 AS f_score
              FROM x),
       tm AS (SELECT id, CAST((row_number() OVER (ORDER BY spend, id)
                - 1) * 3 // count(*) OVER () AS INT) + 1 AS m_score
              FROM x)
     SELECT tr.r_score, tf.f_score, tm.m_score,
       CAST(count(*) AS BIGINT) AS n_customers
     FROM tr JOIN tf USING (id) JOIN tm USING (id)
     GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** q140: supplier-concentration HHI — per part, the Herfindahl
    * index of its supply-quantity shares across suppliers (×1e12 via
    * squared 1e6-shares): the market-concentration screen — HHI near
    * 1e12 means a single-supplier part (supply-chain risk), near
    * 1e12/n means evenly split. One (part, supplier) aggregation,
    * share arithmetic inside the part group via a window sum, squared
    * shares summed per part, TakeOrdered for the most concentrated
    * multi-supplier parts. Floor-share quantization is deterministic
    * and identical cross-engine. */
  def hhiQuery(spark: SparkSession, dir: String,
      topN: Int = 20): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity").cast("decimal(38,10)"), 0).cast("long")
          .as("q"))
      .groupBy("l_partkey", "l_suppkey").agg(sum(col("q")).as("sq"))
    val byPart = Window.partitionBy("l_partkey")
    qty
      .withColumn("total", sum(col("sq")).over(byPart))
      .withColumn("share_e6", expr("sq * 1000000 div total"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("share_e6") * col("share_e6")).as("hhi_e12"))
      .filter(col("n_suppliers") >= 2)
      .orderBy(col("hhi_e12").desc, col("l_partkey").asc)
      .limit(topN)
  }

  /** DuckDB oracle for [[hhiQuery]] (top 20, multi-supplier parts). */
  def hhiOracleSql: String =
    """WITH q AS (SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(round(CAST(l_quantity AS DECIMAL(38,10)), 0)
             AS BIGINT)) AS BIGINT) AS sq
         FROM lineitem GROUP BY 1, 2),
       s AS (SELECT l_partkey,
               sq * 1000000 // sum(sq) OVER (PARTITION BY l_partkey)
                 AS share_e6
             FROM q)
     SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(share_e6 * share_e6) AS BIGINT) AS hhi_e12
     FROM s GROUP BY 1 HAVING count(*) >= 2
     ORDER BY hhi_e12 DESC, l_partkey LIMIT 20"""

  /** q141: seasonal-baseline residuals — each (type, day)'s count
    * compared against its weekday norm, as the exact rational
    * residual_num = y·n_dow − dow_sum (positive ⇒ above the weekday
    * average, scaled by the dow group size so no division happens):
    * the anomaly signal that survives weekly seasonality, where a raw
    * day-over-day diff pages on every Monday. Daily counts collapse
    * first; the weekday norms are a second aggregation of the daily
    * table (both metadata-scale), broadcast back. The registered
    * output keeps the top [[SeasonalTopN]] absolute residuals. */
  val SeasonalTopN = 20

  def seasonalResidualQuery(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("event_type"),
        to_date(col("ts")).as("day"),
        expr("(unix_millis(ts) div 86400000 + 3) % 7 + 1").as("iso_dow"))
      .groupBy("event_type", "day", "iso_dow")
      .agg(count(lit(1)).as("y"))
    val norms = daily.groupBy("event_type", "iso_dow")
      .agg(count(lit(1)).as("n_dow"), sum(col("y")).as("dow_sum"))
    daily.join(broadcast(norms), Seq("event_type", "iso_dow"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("iso_dow"), col("y"),
        (col("y") * col("n_dow") - col("dow_sum")).as("residual_num"),
        col("n_dow"))
      .orderBy(abs(col("residual_num")).desc, col("event_type").asc,
        col("day").asc)
      .limit(SeasonalTopN)
  }

  /** DuckDB oracle for [[seasonalResidualQuery]] (top 20). */
  def seasonalResidualOracleSql: String =
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
           (epoch_ms(ts) // 86400000 + 3) % 7 + 1 AS iso_dow,
           count(*) AS y
         FROM events GROUP BY 1, 2, 3),
       n AS (SELECT event_type, iso_dow, count(*) AS n_dow,
               sum(y) AS dow_sum FROM d GROUP BY 1, 2)
     SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.iso_dow AS BIGINT) AS iso_dow, CAST(d.y AS BIGINT) AS y,
       CAST(d.y * n.n_dow - n.dow_sum AS BIGINT) AS residual_num,
       CAST(n.n_dow AS BIGINT) AS n_dow
     FROM d JOIN n ON n.event_type = d.event_type
       AND n.iso_dow = d.iso_dow
     ORDER BY abs(d.y * n.n_dow - n.dow_sum) DESC, d.event_type, d.day
     LIMIT $SeasonalTopN"""

  /** q142: new vs returning users per day — each day's active users
    * split by whether it is their FIRST active day (the growth-
    * accounting decomposition: activity = acquisition + retention).
    * First-touch days come from one user-keyed min; the daily split
    * is a second aggregation of the distinct (user, day) pairs
    * joined to the broadcast first-touch table. */
  def newVsReturningQuery(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = pairs.groupBy("user_id").agg(min(col("day")).as("d0"))
    pairs.join(first, Seq("user_id"))
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(count(when(col("day") === col("d0"), 1)).as("n_new"),
        count(when(col("day") =!= col("d0"), 1)).as("n_returning"))
      .orderBy("day")
  }

  /** DuckDB oracle for [[newVsReturningQuery]]. */
  def newVsReturningOracleSql: String =
    """WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
         FROM events),
       f AS (SELECT user_id, min(day) AS d0 FROM p GROUP BY 1)
     SELECT strftime(p.day, '%Y-%m-%d') AS day,
       CAST(count(*) FILTER (WHERE p.day = f.d0) AS BIGINT) AS n_new,
       CAST(count(*) FILTER (WHERE p.day != f.d0) AS BIGINT)
         AS n_returning
     FROM p JOIN f USING (user_id)
     GROUP BY 1 ORDER BY 1"""

  /** DuckDB oracle for [[comomentsQuery]]. */
  def comomentsOracleSql: String =
    """WITH f AS (SELECT l_returnflag,
           CAST(round(CAST(l_quantity AS DECIMAL(38,10)), 0) AS BIGINT)
             AS q,
           CAST(round(CAST(l_extendedprice AS DECIMAL(38,10)), 0)
             AS BIGINT) AS d
         FROM lineitem)
     SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q, CAST(sum(d) AS BIGINT) AS sum_d,
       CAST(sum(q * q) AS BIGINT) AS sum_qq,
       CAST(sum(q * d) AS BIGINT) AS sum_qd,
       CAST(sum(d * d) AS BIGINT) AS sum_dd
     FROM f GROUP BY 1 ORDER BY 1"""

  /** q260: trailing 30-day per-customer order aggregates via a RANGE
    * interval frame — the time-bounded moving window every activity/
    * velocity feature ("orders in the last 30 days at each order")
    * needs, and a genuinely different window mode from the ROWS
    * frames elsewhere (q52's rows frame counts ROWS; a RANGE frame
    * admits every row within the VALUE interval, so same-day orders
    * all join the frame regardless of how many there are).
    *
    * Scale shape: the window partitions by customer — per-key frames
    * over each customer's own order history, never a global window.
    * Day numbers are exact integers (days since a fixed epoch), so
    * Spark's `rangeBetween(-29, 0)` and DuckDB's `RANGE BETWEEN 29
    * PRECEDING AND CURRENT ROW` agree bit-for-bit — a RANGE frame
    * over raw timestamps would instead inherit each engine's
    * interval-arithmetic corner cases. */
  def trailingWindowQuery(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
        .cast("long").as("day"),
      (round(col("o_totalprice").cast("decimal(38,10)"), 2) * 100)
        .cast("long").as("cents"))
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-29, 0)
    o.select(col("o_custkey"), col("o_orderkey"), col("day"),
        count(lit(1)).over(w).cast("long").as("n_orders_30d"),
        sum(col("cents")).over(w).cast("long").as("rev_30d_cents"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** DuckDB oracle for [[trailingWindowQuery]] — the same integer-day
    * RANGE frame. */
  def trailingWindowOracleSql: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
           date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
             AS day,
           CAST(round(CAST(o_totalprice AS DECIMAL(38,10)), 2) * 100
             AS BIGINT) AS cents
         FROM orders)
     SELECT o_custkey, o_orderkey, CAST(day AS BIGINT) AS day,
       CAST(count(*) OVER w AS BIGINT) AS n_orders_30d,
       CAST(sum(cents) OVER w AS BIGINT) AS rev_30d_cents
     FROM o
     WINDOW w AS (PARTITION BY o_custkey ORDER BY day
       RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
     ORDER BY o_custkey, o_orderkey"""
}
