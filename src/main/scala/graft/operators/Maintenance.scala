package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance toolkit — the operational jobs a 100 TB parquet
  * lake needs between queries:
  *
  *  - **Compaction**: streaming ingest and fine-grained partitioning
  *    produce many small files; scan cost is then dominated by
  *    per-file open/footer overhead and the scheduler drowns in
  *    splits. Rewriting to size-targeted files restores scan
  *    throughput.
  *  - **File-statistics manifest**: per-file min/max of chosen
  *    columns — the data-skipping index a pruning engine consults
  *    (and the measurement that proves a [[ZOrder]] layout tightened
  *    per-file ranges).
  *  - **Schema-evolution read**: a long-lived table accretes columns;
  *    `mergeSchema` unions file schemas, null-filling late columns in
  *    early files (covered in MaintenanceSpec).
  */
object Maintenance {

  /** Rewrite a parquet directory into ~`targetBytes`-sized files.
    * File count derives from the directory's actual on-disk size, so
    * the job is one read + one write with no sampling pass. Returns
    * the rewritten file count. Writes to `outDir` — compaction into a
    * NEW location plus an atomic swap is the safe production pattern
    * (in-place rewrites lose data on job failure). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    // Each path resolves its OWN filesystem (s3a://, hdfs://, file://
    // can all differ from the configured default fs — and a lake
    // compaction job routinely reads one store and writes another).
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val totalBytes = inPath.getFileSystem(conf)
      .getContentSummary(inPath).getLength
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    spark.read.parquet(inDir)
      .repartition(nFiles.toInt)
      .write.mode("overwrite").parquet(outDir)
    outPath.getFileSystem(conf).listStatus(outPath)
      .count(s => s.getPath.getName.endsWith(".parquet")).toLong
  }

  /** Per-file min/max manifest for `cols` over a parquet directory —
    * one narrow scan grouped by `input_file_name()`. At scale this is
    * the skipping index: a predicate outside a file's [min, max] never
    * opens the file. */
  def fileStats(spark: SparkSession, dir: String,
                cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
