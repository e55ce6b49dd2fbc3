package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinStrategies
import graft.sources.Tables

class JoinStrategiesSpec extends SparkSpec {

  test("bucketed join on matching bucketing elides the shuffle") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val or = Tables.orders(spark, sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    JoinStrategies.writeBucketed(li, "li_b", "l_orderkey", 8)
    JoinStrategies.writeBucketed(or, "or_b", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = JoinStrategies.bucketedJoin(spark, "li_b", "or_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan)
      assert(joined.count() == li.count()) // FK integrity: every item joins
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
    }
  }

  test("salted join equals plain join and spreads hot keys") {
    val li = Tables.lineitem(spark, sf0001)
    val or = Tables.orders(spark, sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(or, "l_orderkey")
      .agg(count(lit(1)), sum(col("l_quantity")).cast("decimal(38,10)"))
      .collect().head
    val salted = JoinStrategies.saltedEquiJoin(li, or, "l_orderkey", 7)
      .agg(count(lit(1)), sum(col("l_quantity")).cast("decimal(38,10)"))
      .collect().head
    assert(plain == salted)
  }
}
