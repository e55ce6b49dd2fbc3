package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Snapshot diff — change-data-capture style reconciliation between
  * two versions of a keyed table, classifying every key as `added`,
  * `removed`, or `changed` (identical rows are dropped). The batch
  * complement of the streaming upsert sink (`streaming/UpsertStream`)
  * and the copy-on-write merge (`Maintenance`): those APPLY deltas,
  * this one DERIVES them — the audit step a lakehouse pipeline runs to
  * validate a load, reconcile replicas, or emit a downstream changelog.
  *
  * Scale shape: ONE full-outer shuffle join on the primary key; both
  * sides are projected to (key, compared columns) before the exchange,
  * so the shuffle carries only what the diff needs. For tables wide
  * enough that carrying every column through the shuffle hurts, the
  * same plan runs on (key, hash(struct(cols))) per side — change rows
  * then re-join by key for the values (the manifest-then-fetch
  * pattern); with a handful of columns, as here, direct comparison is
  * cheaper and keeps the output self-describing.
  */
object ChangeCapture {

  /** Diff two keyed snapshots on `key`, comparing `cols` (which must
    * exist on both sides). Null-safe comparison (`<=>`) so a null →
    * value transition registers as a change. Output: key, change
    * ('added'|'removed'|'changed'), and old_/new_ pairs per compared
    * column. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(key) +: cols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select(col(key) +: cols.map(c => col(c).as(s"new_$c")): _*)
    // presence flags must come from join-side row existence, not value
    // nulls: use a per-side sentinel that survives the outer join.
    val o2 = o.withColumn("_old_present", lit(1))
    val n2 = n.withColumn("_new_present", lit(1))
    val changed = cols.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o2.join(n2, Seq(key), "full_outer")
      .withColumn("change",
        when(col("_old_present").isNull, lit("added"))
          .when(col("_new_present").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(key) +: col("change") +:
        cols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** q91: the registered diff — two deterministic "versions" of the
    * orders table derived by arithmetic on the key (so the oracle
    * rebuilds the identical snapshots):
    *   - v_old drops keys ≡ 0 (mod 101)  → those keys diff as `added`
    *   - v_new drops keys ≡ 0 (mod 97)   → those keys diff as `removed`
    *   - v_new bumps the total by $1 on keys ≡ 0 (mod 89) → `changed`
    * Compared columns are the order status and the exact total cents.
    */
  def snapshotDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_orderstatus"),
      (round(col("o_totalprice").cast("decimal(38,10)"), 2) * 100)
        .cast("long").as("cents"))
    val vOld = base.filter(col("o_orderkey") % 101 =!= 0)
    val vNew = base.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("cents", when(col("o_orderkey") % 89 === 0,
        col("cents") + 100).otherwise(col("cents")))
    snapshotDiff(vOld, vNew, "o_orderkey",
        Seq("o_orderstatus", "cents"))
      .orderBy("o_orderkey")
  }

  /** DuckDB oracle for [[snapshotDiffQuery]] — same derived snapshots,
    * same full-outer classification. */
  def snapshotDiffOracleSql: String =
    """WITH base AS (SELECT o_orderkey, o_orderstatus,
           CAST(round(CAST(o_totalprice AS DECIMAL(38,10)), 2) * 100
             AS BIGINT) AS cents FROM orders),
       v_old AS (SELECT * FROM base WHERE o_orderkey % 101 != 0),
       v_new AS (SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 89 = 0 THEN cents + 100 ELSE cents END
             AS cents
         FROM base WHERE o_orderkey % 97 != 0),
       d AS (SELECT
           coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.cents IS DISTINCT FROM n.cents THEN 'changed'
           END AS change,
           o.o_orderstatus AS old_o_orderstatus,
           n.o_orderstatus AS new_o_orderstatus,
           o.cents AS old_cents, n.cents AS new_cents
         FROM v_old o FULL OUTER JOIN v_new n USING (o_orderkey))
     SELECT * FROM d WHERE change IS NOT NULL ORDER BY o_orderkey"""

  /** q96: schema-drift union — combining extracts whose schemas
    * diverged over time, the ingest-side reality every long-lived
    * pipeline hits. The "v1 extract" (even event ids) carries a legacy
    * `amount_cents` column; the "v2 extract" (odd ids) renamed it to
    * `value_cents` and added a `channel` column. `unionByName` with
    * `allowMissingColumns = true` aligns by NAME (positional UNION
    * would silently zip mismatched columns) and null-fills what each
    * side lacks — a pure metadata operation: no shuffle, the union is
    * plan-level concatenation and the nulls are literal projections.
    * The output audits the drift: per event type and schema version,
    * row counts and how many rows carry each drifted column. */
  def driftUnionQuery(spark: SparkSession, dir: String): DataFrame = {
    // non-finite values -> null cents (not filtered: the drift audit
    // counts them as rows whose drifted column is absent)
    val finiteCents = when(isnan(col("value")) ||
        col("value") === Double.PositiveInfinity ||
        col("value") === Double.NegativeInfinity, lit(null))
      .otherwise(floor(col("value") * 100).cast("long"))
    val ev = Tables.events(spark, dir).select(col("event_id"),
      col("event_type"), finiteCents.as("cents"))
    val v1 = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"),
        col("cents").as("amount_cents"), lit("v1").as("schema_ver"))
    val v2 = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("event_type"),
        col("cents").as("value_cents"),
        concat(lit("ch-"), col("event_type")).as("channel"),
        lit("v2").as("schema_ver"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy("event_type", "schema_ver")
      .agg(count(lit(1)).as("n_rows"),
        count(col("amount_cents")).as("n_legacy_amount"),
        count(col("value_cents")).as("n_value"),
        count(col("channel")).as("n_channel"))
      .orderBy("event_type", "schema_ver")
  }

  /** DuckDB oracle for [[driftUnionQuery]] — UNION ALL BY NAME. */
  def driftUnionOracleSql: String =
    """WITH ev AS (SELECT event_id, event_type,
           CASE WHEN isnan(value) OR NOT isfinite(value) THEN NULL
                ELSE CAST(floor(value * 100) AS BIGINT) END AS cents
         FROM events),
       u AS (
         SELECT event_id, event_type, cents AS amount_cents,
             'v1' AS schema_ver
           FROM ev WHERE event_id % 2 = 0
         UNION ALL BY NAME
         SELECT event_id, event_type, cents AS value_cents,
             'ch-' || event_type AS channel, 'v2' AS schema_ver
           FROM ev WHERE event_id % 2 = 1)
     SELECT event_type, schema_ver, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(amount_cents) AS BIGINT) AS n_legacy_amount,
       CAST(count(value_cents) AS BIGINT) AS n_value,
       CAST(count(channel) AS BIGINT) AS n_channel
     FROM u GROUP BY 1, 2 ORDER BY 1, 2"""
}
