package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files — the
  * plan-evidence artifacts the optimization rounds commit under
  * plans/rNN/. Args: `sfDir outDir suffix name1,name2,...`. Each
  * query's DataFrame is BUILT (for drain-style queries that means the
  * drain runs) and its formatted physical plan written to
  * `outDir/<name>_<suffix>.txt`. Diagnostic tool only. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args(3).split(",").toSeq
    val spark = BenchSession.build()
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      BenchSession.dropPinnedBlocks(spark)
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        println(s"[plandump] wrote $n ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    graft.streaming.StagedDrops.cleanup(spark)
    graft.sources.Scratch.sweep(spark)
    spark.stop()
  }
}
