package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming MERGE: maintain a keyed parquet table from a stream of
  * upserts — the continuous twin of
  * [[graft.operators.Maintenance.copyOnWriteMerge]] and the streaming
  * completion of the batch latest-per-key operator (J6/q08).
  *
  * Structured Streaming's file sink is append-only, so upsert semantics
  * need `foreachBatch`: each micro-batch is reduced to its latest row
  * per key (batch-local window — arrivals within a batch may carry
  * multiple versions) and then copy-on-write-merged into the current
  * snapshot. The checkpoint serializes batches (exactly-once per
  * batch id), so there is never a concurrent writer and the
  * snapshot-swap is safe; on failure mid-merge the batch replays into
  * a fresh snapshot directory, which is why the swap happens only
  * after a successful write (write-new, then repoint — the same
  * crash-safety argument as compaction's).
  *
  * State posture at scale: NO streaming state store at all — the table
  * itself is the state, and each batch's cost is proportional to the
  * touched files, not the table size (the copy-on-write property).
  */
object UpsertStream {

  /** Ordering column must totally order versions of a key within and
    * across batches; ties broken by larger wins being applied later. */
  private def latestPerKey(batch: DataFrame, key: String,
                           version: String): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col(version).desc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Current snapshot directory of an upsert table rooted at `root`
    * (the pointer is the max snapshot id present — a file-listing
    * read, the plain-parquet stand-in for a catalog pointer). */
  def currentSnapshot(spark: SparkSession, root: String): Option[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .map(_.getPath)
      .sortBy(_.getName.drop(1).toLong)
      .lastOption.map(_.toString)
  }

  /** Read the live table (empty-schema-safe only once a snapshot
    * exists — callers check [[currentSnapshot]] first). */
  def readTable(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentSnapshot(spark, root)
      .getOrElse(sys.error(s"no snapshot under $root")))

  /** Start the upsert sink: each micro-batch latest-per-key reduces,
    * then merges into snapshot v{n+1} under `root`. AvailableNow —
    * drain what's there, then stop (the test/ops contract shared by
    * the other streaming entry points). */
  def upsertAvailableNow(spark: SparkSession, dropDir: String, root: String,
                         checkpoint: String, key: String,
                         version: String): Unit = {
    val q = DocStream.readDocStream(spark, dropDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val latest = latestPerKey(batch, key, version)
        currentSnapshot(spark, root) match {
          case None =>
            latest.write.mode("overwrite").parquet(s"$root/v0")
          case Some(cur) =>
            val curId = new Path(cur).getName.drop(1).toLong
            // columns in base order for the merge's schema check
            val base = spark.read.parquet(cur)
            graft.operators.Maintenance.copyOnWriteMerge(
              spark, cur, s"$root/v${curId + 1}",
              latest.select(base.columns.map(col): _*), key)
            ()
        }
      }
      .start()
    q.awaitTermination()
  }
}
