package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source-format coverage beyond parquet: the ORC reader/writer ships
  * in Spark core and carries the same pushdown machinery, so a lake
  * that lands ORC (the common Hive-era format) plugs into every
  * operator unchanged. */
class OrcRoundtripSpec extends SparkSpec {

  test("ORC sink/scan roundtrip preserves rows and pushes filters") {
    val dir = tmpDir("orc_rt")
    val src = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    // same hash-aggregated content both ways
    def digest(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.select(xxhash64(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_returnflag"))
        .cast("decimal(38,0)").as("h")) // ANSI: long sum would overflow
        .agg(sum("h")).head().getDecimal(0)
    assert(digest(back) == digest(src))
    // predicate pushdown reaches the ORC scan
    val plan = back.filter(col("l_returnflag") === "R")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("l_returnflag"), plan.take(800))
  }
}
