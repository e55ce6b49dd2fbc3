package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scratch-space resolution for operators that need a per-call
  * working directory (streaming drops/checkpoints, sketch partials,
  * deletion-vector sidecars).
  *
  * Two properties a 100 TB deployment needs that `java.nio` temp dirs
  * don't give:
  *
  *  1. **Any Hadoop filesystem, not the driver's local disk.** On a
  *     real cluster a file-source stream's drop directory and a
  *     foreachBatch sink must live where EXECUTORS can reach them —
  *     an HDFS/S3A staging prefix, configured once via
  *     `spark.graft.scratch.dir`. Driver-local `java.nio` paths are
  *     correct only in local mode, where driver and executors share a
  *     filesystem. All paths here resolve through the Hadoop
  *     `FileSystem` of the configured root, the same discipline the
  *     [[graft.operators.Maintenance]] copy path uses.
  *  2. **A cleanup ledger for dirs that outlive their call.** Queries
  *     like q145/q149 return LAZY frames over a sunk directory — the
  *     dir must survive the call, so repeated verify/bench reps would
  *     otherwise accumulate a full copy of the staged table each
  *     invocation until the temp filesystem is reclaimed. Outliving
  *     dirs are registered here and [[sweep]] reclaims them at a safe
  *     point (the bench loop calls it between queries, after the
  *     previous query's actions have completed).
  */
object Scratch {

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val outliving = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** The scratch root: `spark.graft.scratch.dir` if configured (on a
    * cluster: a staging prefix every executor can reach), else the
    * driver-local java tmpdir (local mode). */
  def rootOf(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratch.dir")
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Create a fresh scratch directory under the root. Unique per
    * (JVM, call): pid + a process-wide counter — no timestamp needed,
    * and collision-free across concurrent drivers sharing a staging
    * prefix. */
  def dir(spark: SparkSession, prefix: String): String = {
    val pid = ProcessHandle.current().pid()
    val p = new Path(new Path(rootOf(spark)),
      s"graft-$prefix-$pid-${counter.incrementAndGet()}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.mkdirs(p), s"could not create scratch dir $p")
    p.toString
  }

  /** [[dir]], plus registration on the cleanup ledger: for dirs a
    * query's RETURNED lazy frame still reads after the call returns.
    * Reclaimed by the next [[sweep]] — callers of the query own the
    * decision of when its result is no longer live. */
  def dirOutliving(spark: SparkSession, prefix: String): String = {
    val d = dir(spark, prefix)
    outliving.add(d)
    d
  }

  /** Best-effort recursive delete through the path's own filesystem. */
  def delete(spark: SparkSession, d: String): Unit = {
    val p = new Path(d)
    try {
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      ()
    } catch { case _: java.io.IOException => () }
  }

  /** Reclaim every registered outliving dir. Safe once no lazy frame
    * over them is still awaiting an action — e.g. between bench
    * queries, or at the end of a verify run. */
  def sweep(spark: SparkSession): Unit = {
    var d = outliving.poll()
    while (d != null) {
      delete(spark, d)
      d = outliving.poll()
    }
  }
}
