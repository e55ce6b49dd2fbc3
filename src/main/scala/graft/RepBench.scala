package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: same-session repeated timing of a handful of
  * queries, every sample printed. Purpose: adjudicate cross-session
  * bench drift — two BENCH_rN files come from different JVMs minutes
  * or days apart on a host with bursty CPU steal, so a per-query 2x
  * delta between them cannot distinguish a plan regression from a
  * steal burst. Running the suspect queries interleaved in ONE session
  * and printing all samples (not just the min) gives the within-session
  * variance needed to classify the delta. Run:
  * `runMain graft.RepBench /root/testdata/sf0.1 5 q45_dup_clusters q65_incremental_dedup ...`
  */
object RepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q45_dup_clusters", "q65_incremental_dedup", "q116_ri_summary")
    // shared harness = numbers comparable to BENCH_rN per-query figures
    val spark = BenchSession.build()
    BenchSession.warmUp(spark, sfDir)
    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to reps; n <- names) {
      BenchSession.dropPinnedBlocks(spark)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        samples(n) = samples(n) :+ s
        println(f"[rep $r] $n%-28s ${s}%.2fs")
      } catch { case e: Throwable =>
        println(s"[rep $r] $n FAILED: ${e.getMessage}")
      }
    }
    names.foreach { n =>
      val v = samples(n)
      if (v.nonEmpty)
        println(f"SUMMARY $n%-28s min=${v.min}%.2f med=${v.sorted.apply(v.size / 2)}%.2f max=${v.max}%.2f samples=" +
          v.map(x => f"$x%.2f").mkString(","))
    }
    graft.streaming.StagedDrops.cleanup(spark)
    graft.sources.Scratch.sweep(spark)
    spark.stop()
  }
}
