package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Proof that the runtime half of the skew strategy actually engages:
  * the explicit salting operator (q38, JoinStrategies.saltedJoin)
  * handles skew we can PREDICT; everything else relies on AQE's
  * skew-join split, and a conf typo or a future Spark upgrade could
  * silently disable it. This spec plants a hot key that concentrates
  * ~90% of one side into a single hash partition, runs a sort-merge
  * join under thresholds scaled to test size, and asserts the executed
  * plan's join node reports `skew=true` — the marker
  * OptimizeSkewedJoin attaches when it has split skewed partitions.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    import spark.implicits._
    val confs = Seq(
      // force SMJ: a broadcast would bypass the skew reader entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale the skew thresholds to fixture size (defaults are 256MB)
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // coalescing can merge the planted skew away at this size
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows of key 1 (one hash partition swallows them) + a thin
      // uniform tail; probe side small but above broadcast suppression
      val hot = spark.range(200000).select(lit(1L).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val tail = spark.range(1000).select((col("id") + 2).as("k"),
        col("id").cast("string").as("v"))
      val left = hot.unionAll(tail)
      val right = spark.range(2000).select((col("id") % 50 + 1).as("k"),
        col("id").as("w"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would build a separate
      // one and leave this plan un-adapted), then read the final plan
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p                        => p.toString
      }
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(plan.contains("skew=true"),
        "AQE must have split the skewed partition:\n" + plan.take(1500))
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
