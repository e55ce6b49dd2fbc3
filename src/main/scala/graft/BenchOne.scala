package graft

/** Targeted drift adjudication: time ONLY the named queries, same
  * protocol as [[Bench]] (untimed warm-up, pinned-block drops between
  * queries, interleaved reps, min reported). Args:
  * `sfDir name1,name2,... [reps]`.
  *
  * Intended use is the same-session A/B the round reviews keep asking
  * for: `git worktree add /tmp/ab <commit>`, copy this file in, run
  * the identical command in both trees back-to-back (interleaving the
  * invocations spaces each tree's samples across any host steal
  * burst), and compare the printed mins — per-query wall times from
  * DIFFERENT sessions are not comparable on this host (documented
  * 60–92% steal bursts, Bench.scala). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = BenchSession.build()
    BenchSession.warmUp(spark, sfDir)
    val samples = for (_ <- 1 to reps; n <- names) yield {
      BenchSession.dropPinnedBlocks(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      n -> (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val s = samples.collect { case (`n`, t) => t }
      println(f"[benchone] $n min=${s.min}%.3f " +
        s"samples=${s.map(t => f"$t%.3f").mkString(",")}")
    }
    if (graft.operators.DupClusters.lastAlternations >= 0)
      println("[benchone] cc_alternations=" +
        graft.operators.DupClusters.lastAlternations)
    graft.streaming.StagedDrops.cleanup(spark)
    graft.sources.Scratch.sweep(spark)
    spark.stop()
  }
}
