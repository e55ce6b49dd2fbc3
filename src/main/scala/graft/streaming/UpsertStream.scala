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

  /** The q253 upsert feed as a shared two-wave drop: key = user_id
    * (as doc_id), version = event_id as a ms timestamp, split by
    * version so the second batch must overwrite the first. Shared so
    * the failure-injection spec replays EXACTLY the drop the oracle
    * query drains. */
  def stageUpsertWaves(spark: SparkSession, dir: String): String =
    StagedDrops.shared(spark, "upsert_waves2", dir) { d =>
      val staged = graft.sources.Tables.events(spark, dir)
        .select(col("user_id").as("doc_id"),
          timestamp_millis(col("event_id")).as("ts"),
          col("event_type").as("text"),
          col("event_type").as("source"))
        .withColumn("wave",
          (ntile(2).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("ts"), col("doc_id"))) - 1).cast("int"))
        .localCheckpoint()
      EventStream.stageWaveFiles(spark, staged,
        Seq("doc_id", "ts", "text", "source"), 2, d)
    }

  /** Apply one upsert micro-batch to the table under `root`: reduce
    * to latest-per-key, then copy-on-write merge into snapshot
    * v{n+1}. IDEMPOTENT under batch replay — foreachBatch is
    * at-least-once, so after a crash between a completed merge and
    * its checkpoint commit the SAME batch re-merges; overwriting the
    * same keys with the same latest rows yields an identical
    * snapshot (the replay-safety the failure-injection spec proves). */
  private def applyUpsertBatch(spark: SparkSession, root: String,
      batch: DataFrame, key: String, version: String): Unit = {
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

  /** The q253 drain: one wave file per micro-batch so the second
    * batch's merge must overwrite rows the first batch wrote. Returns
    * the carried-rows batch count. `failAfterMergeAt` injects a crash
    * AFTER that batch's merge completed but BEFORE its checkpoint
    * commit — the worst-case at-least-once window (the spec kills at
    * batch 0 and at batch 1, restarts on the same checkpoint, and
    * proves the replayed merge converges to the oracle snapshot). */
  private[graft] def drainUpsertWaves(spark: SparkSession,
      drop: String, root: String, ck: String,
      failAfterMergeAt: Option[Long] = None): Long = {
    val q = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", "1").json(drop)
      .writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyUpsertBatch(spark, root, batch, "doc_id", "ts")
        if (failAfterMergeAt.contains(batchId))
          throw new IllegalStateException(
            s"injected crash after batch $batchId merge")
      }
      .start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0).toLong
  }

  /** q253: the upsert SINK itself under oracle check (previously
    * unit-only). Events become an upsert feed — key = user_id (staged
    * as doc_id), version = event_id encoded as a MILLISECOND
    * timestamp (globally unique, so latest-per-key is total-order
    * deterministic; millis because the JSON staging format truncates
    * micros), payload = event_type — split into two waves by
    * version so the second batch must genuinely OVERWRITE first-batch
    * rows through the copy-on-write merge, not just append. The final
    * snapshot read back must equal DuckDB's argmax per user over the
    * original events: equality certifies batch-local reduce, merge,
    * snapshot pointer, and replay-safe ordering end to end. */
  def upsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.sources.Scratch.dirOutliving(spark, "q253_table")
    val drop = stageUpsertWaves(spark, dir)
    val ck = graft.sources.Scratch.dir(spark, "q253_ck")
    try {
      val batches = drainUpsertWaves(spark, drop, root, ck)
      require(batches == 2,
        s"q253 staged 2 wave files but streamed $batches micro-batches " +
          "— a single batch never exercises the overwrite merge")
    } finally graft.sources.Scratch.delete(spark, ck)
    readBack(spark, currentSnapshot(spark, root)
      .getOrElse(sys.error(s"q253 drained but no snapshot under $root")))
  }

  /** Rows each q253 table snapshot holds (the staged doc layout). */
  val sinkSchema: org.apache.spark.sql.types.StructType =
    DocStream.docSchema

  /** q253's post-drain read-back over the resolved FINAL snapshot
    * directory (callers resolve via [[currentSnapshot]]). */
  def readBack(spark: SparkSession, snapshot: String): DataFrame =
    spark.read.parquet(snapshot)
      .select(col("doc_id").cast("long").as("user_id"),
        col("text").as("latest_type"),
        unix_millis(col("ts")).as("ver"))
      .orderBy("user_id")

  /** DuckDB oracle for [[upsertQuery]]: argmax per user by event_id
    * (the staged version) over the original events. */
  def upsertOracleSql: String =
    """SELECT user_id, event_type AS latest_type,
         CAST(event_id AS BIGINT) AS ver
       FROM (SELECT user_id, event_type, event_id, row_number() OVER
           (PARTITION BY user_id ORDER BY event_id DESC) AS rn
         FROM events)
       WHERE rn = 1 ORDER BY user_id"""

  /** q265: the upsert feed's CHANGE DATA FEED — what the q253 table
    * looks like to a DOWNSTREAM consumer: per micro-batch, the
    * latest-per-key rows are classified insert vs update against the
    * PRE-merge snapshot and appended to a CDC log partition
    * (`cdc/batch=<id>`), then the merge applies as in q253. The log
    * is the incremental-replication contract (a reader applies each
    * batch's ops in order and reconstructs the table without ever
    * scanning it) — the streaming completion of the deletion-vector /
    * SCD2 maintenance family. Cost per batch: the batch itself plus
    * one key-join against the current snapshot — never a table scan.
    *
    * The oracle replays the two-wave schedule in SQL: the staging
    * splits by version (ntile over (ts=millis(event_id), doc_id)), so
    * wave-0 keys land as batch-0 inserts and every wave-1 key is a
    * batch-1 update iff it appeared in wave 0. Batch classification,
    * per-batch latest-per-key, the pre-merge snapshot probe, and the
    * partitioned log layout are all certified by the hash match. */
  def cdcQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.sources.Scratch.dirOutliving(spark, "q265_table")
    val cdc = graft.sources.Scratch.dirOutliving(spark, "q265_cdc")
    val drop = stageUpsertWaves(spark, dir)
    val ck = graft.sources.Scratch.dir(spark, "q265_ck")
    try {
      val batches = drainCdcWaves(spark, drop, root, cdc, ck)
      require(batches == 2,
        s"q265 staged 2 wave files but streamed $batches micro-batches " +
          "— a single batch never exercises the update classification")
    } finally graft.sources.Scratch.delete(spark, ck)
    cdcReadBack(spark, cdc)
  }

  /** The q265 drain, factored with the q253-style failure hook so the
    * restart spec can kill it between a batch's CDC-write+merge and
    * its checkpoint commit. Returns the carried-rows batch count. */
  private[graft] def drainCdcWaves(spark: SparkSession, drop: String,
      root: String, cdc: String, ck: String,
      failAfterBatch: Option[Long] = None): Long = {
    val q = spark.readStream.schema(DocStream.docSchema)
      .option("maxFilesPerTrigger", "1").json(drop)
      .writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch feeds BOTH the CDC diff and the merge — persist so
        // the source scan runs once per micro-batch
        batch.persist()
        try {
          val latest = latestPerKey(batch, "doc_id", "ts")
          // The PRE-merge key set: updates are keys the table
          // already holds. Resolved as snapshot v{batchId-1} BY
          // NUMBER, never currentSnapshot: foreachBatch is
          // at-least-once, and a replayed batch would see its own
          // completed merge through the current pointer and
          // misclassify its inserts as updates — v{b-1} still
          // exists after the merge (merges only add v{b}), and a
          // replayed merge writes a content-identical snapshot, so
          // the replayed diff (and its mode-overwrite log partition)
          // is bit-identical: the q253 merge's replay-safety
          // argument, extended to the log and proven by
          // UpsertRestartSpec's CDC case.
          val existing =
            if (batchId == 0) latest.limit(0)
              .select(col("doc_id")).withColumn("__ex", lit(1))
            else spark.read.parquet(s"$root/v${batchId - 1}")
              .select(col("doc_id")).withColumn("__ex", lit(1))
          latest.join(existing, Seq("doc_id"), "left")
            .select(
              when(col("__ex").isNotNull, lit("update"))
                .otherwise(lit("insert")).as("op"),
              col("doc_id"), unix_millis(col("ts")).as("ver"))
            .write.mode("overwrite").parquet(s"$cdc/batch=$batchId")
          applyUpsertBatch(spark, root, batch, "doc_id", "ts")
          if (failAfterBatch.contains(batchId))
            throw new IllegalStateException(
              s"injected crash after batch $batchId cdc+merge")
        } finally batch.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0).toLong
  }

  /** Rows each q265 CDC partition holds. `batch` is the partition
    * column restored from the `batch=<id>` directory names on the
    * real log; declared here so the audit stub carries it too. */
  val cdcSinkSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("op", StringType),
      StructField("doc_id", LongType),
      StructField("ver", LongType),
      StructField("batch", IntegerType)))
  }

  /** q265's post-drain read-back — the ordered CDC log. */
  def cdcReadBack(spark: SparkSession, cdc: String): DataFrame =
    spark.read.parquet(cdc)
      .select(col("batch").cast("int").as("batch"), col("op"),
        col("doc_id").cast("long").as("user_id"),
        col("ver").cast("long").as("ver"))
      .orderBy("batch", "user_id")

  /** DuckDB oracle for [[cdcQuery]] — the two-wave lifecycle replayed
    * relationally (same ntile split as the staging; ts encodes
    * event_id, so ordering by (event_id, user_id) is the staging's
    * (ts, doc_id) order). */
  def cdcOracleSql: String =
    """WITH w AS (SELECT user_id, event_id,
           ntile(2) OVER (ORDER BY event_id, user_id) - 1 AS wave
         FROM events),
       b0 AS (SELECT user_id, max(event_id) AS ver FROM w
              WHERE wave = 0 GROUP BY 1),
       b1 AS (SELECT user_id, max(event_id) AS ver FROM w
              WHERE wave = 1 GROUP BY 1)
     SELECT CAST(0 AS INT) AS batch, 'insert' AS op, user_id,
       CAST(ver AS BIGINT) AS ver FROM b0
     UNION ALL
     SELECT CAST(1 AS INT), CASE WHEN user_id IN
         (SELECT user_id FROM b0) THEN 'update' ELSE 'insert' END,
       user_id, CAST(ver AS BIGINT) FROM b1
     ORDER BY batch, user_id"""

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
