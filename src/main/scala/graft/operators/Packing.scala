package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** q237: CONTEXT-WINDOW ASSIGNMENT — the concat-and-split packing
  * every causal-LM pretraining pipeline applies: documents are
  * concatenated in a deterministic order and the token stream is cut
  * into fixed windows of [[ContextLen]] tokens. The per-document
  * facts a data loader and an attrition audit need: which window the
  * doc starts in, at what offset, how many windows it spans, and
  * whether it is split across a window boundary (split docs lose
  * cross-boundary attention in block-diagonal packing — the fraction
  * split is a quality metric of the packing order).
  *
  * The stream is PER SOURCE (partitioned by `source`, ordered by
  * doc_id), not global: sharded pretraining data is packed within a
  * shard, and — the part that matters at 100 TB — a per-key running
  * sum is a keyed window Spark executes shard-parallel, where a
  * single global ordering would funnel the corpus through one
  * partition. q143 audits the padding arithmetic of the fixed-stride
  * chunker; q55 maps documents onto a single GLOBAL stream (whose
  * total-order window is exactly the funnel this query avoids); this
  * is the sharded packing map with the split-document accounting
  * neither reports.
  */
object Packing {

  val ContextLen = 128L

  def contextWindowsQuery(spark: SparkSession, dir: String): DataFrame =
    contextWindows(Tables.documents(spark, dir))

  def contextWindows(docs: DataFrame): DataFrame = {
    val c = ContextLen
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
      .withColumn("cum_before",
        coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_toks"),
        expr(s"cum_before div $c").as("first_window"),
        expr(s"cum_before % $c").as("window_offset"),
        (expr(s"(cum_before + n_toks - 1) div $c")
          - expr(s"cum_before div $c") + lit(1L)).as("n_windows"),
        when(expr(s"(cum_before + n_toks - 1) div $c")
          =!= expr(s"cum_before div $c"), 1).otherwise(0).cast("int")
          .as("is_split"))
      .orderBy("doc_id")
  }

  /** DuckDB re-derivation — same keyed running sum and integer
    * window arithmetic. */
  def contextWindowsOracleSql: String = {
    val ws = "\\s+"
    val c = ContextLen
    s"""WITH t AS (SELECT doc_id, source,
           CAST(len(string_split_regex(trim(text), '$ws')) AS BIGINT)
             AS n_toks
         FROM documents),
       s AS (SELECT doc_id, source, n_toks,
           -- the window sum of BIGINT widens to HUGEINT; cast back so
           -- the derived integers surface as BIGINT, not doubles
           CAST(coalesce(sum(n_toks) OVER (PARTITION BY source
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cum_before
         FROM t)
     SELECT doc_id, source, n_toks,
       CAST(cum_before // $c AS BIGINT) AS first_window,
       CAST(cum_before % $c AS BIGINT) AS window_offset,
       CAST((cum_before + n_toks - 1) // $c - cum_before // $c + 1
         AS BIGINT) AS n_windows,
       CAST(CASE WHEN (cum_before + n_toks - 1) // $c
             <> cum_before // $c THEN 1 ELSE 0 END AS INT) AS is_split
     FROM s ORDER BY doc_id"""
  }
}
