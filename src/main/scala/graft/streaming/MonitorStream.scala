package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.quality.DataQuality

/** Streaming data-quality monitor — the q138 rule-assertion suite
  * evaluated continuously: each micro-batch's violation counts land
  * as one timeline row per rule under `monitorDir/batch=<id>`
  * (overwritten on replay — the same idempotent per-batch-partition
  * sink as the CMS partials), giving the quality dashboard its time
  * axis for free. Because every rule is an algebraic sum, the
  * timeline AGGREGATES to exactly the batch suite over the same data
  * — the equivalence the spec asserts; an alerting layer reads the
  * per-batch rows instead (a rule that was always-zero suddenly
  * spiking is the page, and it is invisible in the corpus total).
  */
object MonitorStream {

  /** Drain `dropDir` with AvailableNow, appending one rule-count row
    * set per micro-batch under `monitorDir/batch=<id>`. */
  def monitorAvailableNow(spark: SparkSession, dropDir: String,
      monitorDir: String, checkpoint: String): Unit = {
    val q = EventStream.readEventStream(spark, dropDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        DataQuality.assertionSuite(withRuleColumns(batch))
          .write.mode("overwrite")
          .parquet(s"$monitorDir/batch=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Normalize a stream batch for the rule suite: derive `ts_ms` and
    * null-fill columns a leaner stream schema lacks (a missing column
    * then reads as all-violating or all-passing per its rule — drift
    * surfaces in the counts instead of crashing the monitor). */
  def withRuleColumns(batch: DataFrame): DataFrame = {
    val withTs = batch.withColumn("ts_ms", unix_millis(col("ts")))
    if (withTs.columns.contains("props")) withTs
    else withTs.withColumn("props", lit(null).cast("string"))
  }

  /** The rule totals across every monitored batch — equals the batch
    * suite over the union of the drops (asserted in StreamingSpec). */
  def ruleTotals(spark: SparkSession, monitorDir: String): DataFrame =
    spark.read.parquet(monitorDir)
      .groupBy("rule")
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_violations")).as("n_violations"))
      .orderBy("rule")
}
