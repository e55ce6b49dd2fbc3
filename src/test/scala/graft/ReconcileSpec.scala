package graft

import org.apache.spark.sql.functions._

/** q266: the typed cogroup must reproduce the relational full-outer
  * reconciliation exactly — keys, iterator contents, co-partitioning,
  * and the three status classes. */
class ReconcileSpec extends SparkSpec {

  test("cogroup reconciliation equals the full-outer-join reference") {
    val got = graft.operators.Reconcile.reconcileQuery(spark, sf0001)
    val o = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_custkey").as("custkey"),
        (round(col("o_totalprice").cast("decimal(38,10)"), 2) * 100)
          .cast("long").as("cents"))
      .groupBy("custkey")
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(col("cents")).cast("long").as("order_cents"))
    val e = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("user_id").as("custkey"))
      .agg(count(lit(1)).cast("long").as("n_events"))
    val ref = o.join(e, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("order_cents"), lit(0L)).as("order_cents"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_orders").isNotNull && col("n_events").isNotNull,
          "both")
          .when(col("n_orders").isNotNull, "orders_only")
          .otherwise("events_only").as("status"))
      .orderBy("custkey")
    assert(got.collect().toSeq == ref.collect().toSeq)
  }

  test("all three status classes classify correctly") {
    import spark.implicits._
    // key 1 in both systems, 2 orders-only, 3 events-only (twice)
    val out = graft.operators.Reconcile.reconcile(spark,
        Seq((1L, 100L), (1L, 250L), (2L, 50L)).toDF("k", "cents"),
        Seq(1L, 3L, 3L).toDF("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toList
    assert(out == List(
      (1L, 2L, 350L, 1L, "both"),
      (2L, 1L, 50L, 0L, "orders_only"),
      (3L, 0L, 0L, 2L, "events_only")), out.toString)
  }
}
