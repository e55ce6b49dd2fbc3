package graft.quality

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Single-pass piggybacked QC metrics via `Dataset.observe` (q245).
  *
  * The 100 TB problem this solves: every curation write wants quality
  * counters next to it (rows kept, chars, empties, id range, language
  * mix), and the naive shape pays a SECOND full scan — or worse, one
  * `count()`/`agg()` action per counter — after the write. `observe`
  * attaches the aggregates to the write's own plan: the metrics are
  * accumulated by the same tasks that produce the output files and
  * cost zero extra scans, zero extra shuffles (an `observe` node is a
  * `CollectMetricsExec` wrapping the stage — partial aggregation in
  * each task, final merge on the driver event bus).
  *
  * Contrast with the repo's other QC surfaces: [[DataQuality]] runs
  * standalone violation queries (each its own scan — right for audits,
  * wrong inline with a big write), and the streaming monitor
  * (`MonitorStream`) aggregates per micro-batch. This is the batch
  * inline form.
  *
  * The query gates documents (the q29-style keep band), writes the
  * gated set to scratch parquet — the real action — and returns the
  * OBSERVED metrics as a one-row frame. The DuckDB oracle recomputes
  * the same aggregates over the same gate, so the hash-match certifies
  * that riding the write scan loses nothing vs a dedicated pass. All
  * metrics are integer counts/sums (hash-stable); the whitespace count
  * uses length(text) - length(replace(text,' ','')), portable to the
  * word.
  */
object ObservedMetrics {

  /** Keep band: mid-length docs in the two head languages. */
  val MinChars = 50L
  val MaxChars = 5000L

  private def gate(docs: DataFrame): DataFrame =
    docs.filter(col("n_chars") >= MinChars &&
      col("n_chars") <= MaxChars &&
      col("lang").isin("en", "de"))

  /** The observed aggregates — declared once so the Spark side and the
    * scaladoc'd contract stay in sync. */
  private def metricColumns = Seq(
    count(lit(1)).cast("long").as("n_docs"),
    sum(length(col("text"))).cast("long").as("n_chars_total"),
    sum(when(col("text").isNull || length(col("text")) === 0, 1L)
      .otherwise(0L)).cast("long").as("n_empty"),
    min(col("doc_id")).cast("long").as("min_doc_id"),
    max(col("doc_id")).cast("long").as("max_doc_id"),
    sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("long")
      .as("n_en"),
    sum(length(col("text")) -
      length(translate(col("text"), " ", ""))).cast("long")
      .as("n_spaces"))

  /** q245: gate → observe → write in ONE action; return the metrics
    * the write's own tasks accumulated. */
  def observedWriteQuery(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.Scratch.dir(spark, "q245_out")
    try {
      val obs = Observation()
      gate(graft.sources.Tables.documents(spark, dir))
        .observe(obs, metricColumns.head, metricColumns.tail: _*)
        .write.mode("overwrite").parquet(out)
      val m = obs.get // blocks only until the finished write reports
      // an empty gate yields NULL sums/min/max, which asInstanceOf
      // would silently unbox to 0 — fail loudly instead of emitting a
      // fabricated zero row the oracle (all NULLs) would reject
      require(m("n_docs").asInstanceOf[Long] > 0L,
        "q245 gate matched zero documents — observed sums/min/max " +
          "are undefined on this corpus")
      val names = Seq("n_docs", "n_chars_total", "n_empty",
        "min_doc_id", "max_doc_id", "n_en", "n_spaces")
      import spark.implicits._
      Seq(names.map(n => m(n).asInstanceOf[Long]))
        .toDF("v")
        .select(names.zipWithIndex.map { case (n, i) =>
          col("v").getItem(i).as(n) }: _*)
    } finally graft.sources.Scratch.delete(spark, out)
  }

  /** DuckDB oracle: the same aggregates over the same gate, computed
    * the expensive way (a dedicated pass). */
  def observedWriteOracleSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS n_chars_total,
         CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
           THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
         CAST(min(doc_id) AS BIGINT) AS min_doc_id,
         CAST(max(doc_id) AS BIGINT) AS max_doc_id,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_en,
         CAST(sum(length(text) - length(replace(text, ' ', '')))
           AS BIGINT) AS n_spaces
       FROM documents
       WHERE n_chars >= $MinChars AND n_chars <= $MaxChars
         AND lang IN ('en', 'de')"""
}
