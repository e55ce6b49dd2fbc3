package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed COGROUP — the Dataset API's escape hatch when per-key logic
  * needs BOTH sides' iterators at once: `KeyValueGroupedDataset
  * .cogroup` co-partitions the two inputs on the key (one shuffle per
  * side, no join materialization — the pair blow-up a join would
  * build never exists) and hands each key's two groups to one
  * function. The relational engine covers everything expressible as
  * join+agg; cogroup is for the shapes that aren't (per-key sequence
  * alignment, custom reconciliation state machines). This operator
  * certifies the PLUMBING with a deliberately relational body — the
  * oracle is a full outer join of two GROUP BYs, so the hash match
  * proves keys, iterators, and co-partitioning behave exactly like
  * the declarative plan, which is the precondition for trusting the
  * non-relational uses.
  */
object Reconcile {

  case class OrderSide(k: Long, cents: Long)
  case class EventSide(k: Long)
  case class ReconcileRow(custkey: Long, n_orders: Long,
      order_cents: Long, n_events: Long, status: String)

  /** q266: per-customer reconciliation of the order book against the
    * activity feed — every key on either side, its order count/value
    * and event count, and which system knows it (`both` /
    * `orders_only` / `events_only`): the cross-system audit a
    * warehouse runs before trusting a join between the two. */
  def reconcileQuery(spark: SparkSession, dir: String): DataFrame =
    reconcile(spark,
      Tables.orders(spark, dir)
        .select(col("o_custkey").as("k"),
          (round(col("o_totalprice").cast("decimal(38,10)"), 2) * 100)
            .cast("long").as("cents")),
      Tables.events(spark, dir).select(col("user_id").as("k")))

  /** [[reconcileQuery]]'s core over (k, cents) orders and (k) events
    * frames — the composable/class-coverage-testable form. */
  def reconcile(spark: SparkSession, ordersK: DataFrame,
      eventsK: DataFrame): DataFrame = {
    import spark.implicits._
    val orders = ordersK.as[OrderSide]
    val events = eventsK.as[EventSide]
    orders.groupByKey(_.k).cogroup(events.groupByKey(_.k)) {
      (k, os, es) =>
        // both iterators fold to bounded per-key state (counts and a
        // cents sum) — nothing per-key materializes
        var n = 0L; var c = 0L
        os.foreach { r => n += 1; c += r.cents }
        var m = 0L
        es.foreach { _ => m += 1 }
        val status =
          if (n > 0 && m > 0) "both"
          else if (n > 0) "orders_only"
          else "events_only"
        Iterator.single(ReconcileRow(k, n, c, m, status))
    }.toDF().orderBy("custkey")
  }

  /** DuckDB oracle for [[reconcileQuery]] — the relational statement
    * of the same reconciliation (full outer join of two GROUP BYs). */
  def reconcileOracleSql: String =
    """WITH o AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT)
             AS n_orders,
           CAST(sum(CAST(round(CAST(o_totalprice AS DECIMAL(38,10)), 2)
             * 100 AS BIGINT)) AS BIGINT) AS order_cents
         FROM orders GROUP BY 1),
       e AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY 1)
     SELECT k AS custkey,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(order_cents, 0) AS order_cents,
       coalesce(n_events, 0) AS n_events,
       CASE WHEN n_orders IS NOT NULL AND n_events IS NOT NULL
              THEN 'both'
            WHEN n_orders IS NOT NULL THEN 'orders_only'
            ELSE 'events_only' END AS status
     FROM o FULL OUTER JOIN e USING (k)
     ORDER BY custkey"""
}
