package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming upgrade of the reference's incremental-arrival
  * pattern (reference airflow/dags/s3_data_checker.py:96-103 +
  * dft_data_flow_dag.py:18-26: "is new data in the bucket?" branch).
  *
  * The reference polls a prefix and branches a batch DAG; the Spark
  * idiom is a file-source stream with `Trigger.AvailableNow` —
  * exactly-once over whatever has arrived, then stop. The same code
  * runs continuously (micro-batch) by swapping the trigger. Watermarked
  * event-time windows cover the aggregation the reference would push to
  * a dashboard (the reference itself has no event-time semantics —
  * SURVEY §2.9 — so these are the beyond-parity streaming surface).
  */
object EventStream {

  /** Event schema for streamed JSONL drops (mirrors the events table). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** File-source stream over a drop directory of JSONL files. */
  def readEventStream(spark: SparkSession, dropDir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "16")
      .json(dropDir)

  /** Watermarked tumbling-window aggregation: events per type per
    * minute, late data beyond 10 minutes dropped from state. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Process everything currently in the drop dir into a parquet sink,
    * then stop (AvailableNow = the reference's "new data?" branch with
    * exactly-once bookkeeping in the checkpoint). Returns the query
    * after awaiting termination. */
  def ingestAvailableNow(spark: SparkSession, dropDir: String,
                         outDir: String, checkpointDir: String): StreamingQuery = {
    val q = readEventStream(spark, dropDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** q149: the exactly-once PARQUET FILE SINK ingest path driven to a
    * hash-checked answer — the events table is staged as a JSONL drop
    * (epoch-ms times, exact-integer round-trip), drained through a
    * real `writeStream.format("parquet")` with AvailableNow (multiple
    * micro-batches via `maxFilesPerTrigger`; the sink's
    * `_spark_metadata` commit log is what makes replayed batches
    * invisible to readers), and the LANDED table — read back in batch
    * mode through that commit log — is sessionized. The result must
    * equal q46's gap-sessionization oracle over the raw events, so a
    * hash match certifies the whole ingest path: staging, streaming
    * file sink, commit-log read-back, and the session arithmetic —
    * complementing q145, which covers the foreachBatch sink family.
    *
    * Temp dirs are per-call (fresh checkpoint → full drop processed
    * every run); the drop and checkpoint are deleted once the stream
    * has drained, the sunk table outlives the call for the returned
    * lazy frame. */
  def ingestSessionQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val drop = java.nio.file.Files.createTempDirectory("q149_drop").toString
    val sunk = java.nio.file.Files.createTempDirectory("q149_sunk").toString
    val ck = java.nio.file.Files.createTempDirectory("q149_ck").toString
    graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("t"))
      .repartition(6)
      .write.mode("overwrite").json(drop)
    val dropSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("t", LongType)))
    // sunk intentionally outlives the call (the returned frame reads
    // it lazily); drop + checkpoint are dead after the drain and are
    // deleted even when the stream throws
    try {
      val q = spark.readStream
        .schema(dropSchema)
        .option("maxFilesPerTrigger", "2")
        .json(drop)
        .writeStream
        .format("parquet")
        .option("path", sunk)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      for (d <- Seq(drop, ck)) {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    }
    graft.operators.Sessionize.sessionsFromMs(spark.read.parquet(sunk))
  }

  /** Windowed aggregate to an in-memory sink, AvailableNow — used by
    * tests and as the pattern for a live dashboard feed. */
  def aggregateAvailableNow(spark: SparkSession, dropDir: String,
                            queryName: String, checkpointDir: String): StreamingQuery = {
    val q = windowedCounts(readEventStream(spark, dropDir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
