package graft

/** Same-session interleaved A/B of session-conf variants over one
  * query (diagnostic tool, Bench protocol: warm-up, pinned-block
  * drops, interleaved reps, min per variant). Cross-session numbers
  * on this host are incomparable (documented steal bursts), so the
  * variants alternate inside ONE JVM. Args:
  * `sfDir query reps key1=val1,key2=val2|key1=val1,... ` — each
  * `|`-separated group is one variant; an empty group is the
  * unmodified baseline. Conf keys are set before and restored after
  * each sample, so variants cannot leak into each other. */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args(2).toInt
    val variants: Seq[Seq[(String, String)]] = args(3).split('|').toSeq
      .map(_.trim).map { g =>
        if (g.isEmpty) Nil
        else g.split(',').toSeq.map { kv =>
          val Array(k, v) = kv.split("=", 2); (k, v)
        }
      }
    val spark = BenchSession.build()
    BenchSession.warmUp(spark, sfDir)
    val samples =
      for (_ <- 1 to reps; (vs, vi) <- variants.zipWithIndex) yield {
        BenchSession.dropPinnedBlocks(spark)
        val prior = vs.map { case (k, _) =>
          k -> spark.conf.getOption(k) }
        vs.foreach { case (k, v) => spark.conf.set(k, v) }
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        finally prior.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
        vi -> (System.nanoTime() - t0) / 1e9
      }
    variants.zipWithIndex.foreach { case (vs, vi) =>
      val s = samples.collect { case (`vi`, t) => t }
      println(f"[confab] v$vi min=${s.min}%.3f " +
        s"samples=${s.map(t => f"$t%.3f").mkString(",")} " +
        s"conf=${vs.map { case (k, v) => s"$k=$v" }.mkString(",")}")
    }
    graft.streaming.StagedDrops.cleanup(spark)
    graft.sources.Scratch.sweep(spark)
    spark.stop()
  }
}
