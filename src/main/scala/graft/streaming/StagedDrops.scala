package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Session-memoized staging for streaming drains.
  *
  * Staging a drop directory (writing the fixture table out as JSONL
  * wave files) is FIXTURE PLUMBING, not the operator under test — but
  * it used to run once per query: q229/q251/q252 staged three copies
  * of the same click/purchase feed, q253–q257 re-staged per query,
  * and every bench rep repeated all of it. Each distinct staging
  * VARIANT is now staged once per (JVM, sf dir) and reused across
  * queries and bench reps; what stays per-drain is everything the
  * correctness claim actually covers — a fresh checkpoint, the
  * stream read, state stores, sink commit log, and read-back.
  *
  * Sharing is sound because staging is deterministic (wave splits
  * order by (ts, id); wave-file mtimes are pinned by stageWaveFiles)
  * and drains never mutate their drop. If a cached drop vanished
  * (external tmp cleanup), it is re-staged to a fresh dir.
  *
  * Drops live until [[cleanup]] (called by Bench/Verify/BenchOne/
  * ScalingCurve at the END of a run — NOT Scratch's between-query
  * sweep, which would defeat the sharing). A JVM shutdown hook,
  * registered on first staging, is the backstop for callers that
  * never reach an explicit cleanup (test suites, a killed run) — so
  * staged JSONL copies of the fixture tables can't persist in the
  * scratch root after process exit.
  */
object StagedDrops {

  /** Concurrent map, NOT the staging monitor: the shutdown hook reads
    * it lock-free, so a Ctrl-C arriving while a staging pipeline is
    * mid-flight (Spark jobs run INSIDE the staging lock) can never
    * block JVM exit behind that pipeline — the hook snapshots whatever
    * is registered and deletes outside any monitor. An entry staged
    * concurrently with shutdown may be missed; Scratch's root sweep is
    * the backstop for that sliver. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile private var hookConf: Option[org.apache.hadoop.conf.Configuration] = None
  private val stagingLock = new Object

  /** The drop for `variant` over `dir`, staging via `stage` on first
    * use. `stage` receives a fresh empty scratch dir. Stagings are
    * serialized on a dedicated monitor (one fixture write at a time;
    * re-entrant queries just hit the cache). */
  def shared(spark: SparkSession, variant: String, dir: String)(
      stage: String => Unit): String = stagingLock.synchronized {
    if (hookConf.isEmpty) {
      // capture the Hadoop conf NOW — at hook time the SparkContext
      // may already be stopped, but the conf object stays usable
      hookConf = Some(spark.sparkContext.hadoopConfiguration)
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => deleteAllBestEffort(), "staged-drops-cleanup"))
    }
    val key = s"$variant|$dir"
    val live = Option(cache.get(key)).filter { d =>
      val p = new Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    live.getOrElse {
      val drop = graft.sources.Scratch.dir(spark, s"shared_$variant")
      stage(drop)
      cache.put(key, drop)
      drop
    }
  }

  /** Delete every cached drop. Safe once no drain is in flight. */
  def cleanup(spark: SparkSession): Unit = stagingLock.synchronized {
    cache.values.forEach(d => graft.sources.Scratch.delete(spark, d))
    cache.clear()
  }

  /** The shutdown-hook path: delete through the captured conf, never
    * throw (the JVM is exiting; a cleanup failure must not mask the
    * real exit). Deliberately does NOT take [[stagingLock]] — see the
    * cache scaladoc. */
  private def deleteAllBestEffort(): Unit = {
    for (conf <- hookConf) {
      val it = cache.values.iterator()
      while (it.hasNext) {
        val d = it.next()
        try {
          val p = new Path(d)
          p.getFileSystem(conf).delete(p, true)
          ()
        } catch { case _: Throwable => () }
      }
    }
    cache.clear()
  }
}
