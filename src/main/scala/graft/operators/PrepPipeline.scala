package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** The composed training-data preparation pipeline — the end-to-end
  * flow an LLM-corpus user actually runs, built purely from the
  * engine's own primitives so the whole composition stays one
  * declarative plan Catalyst can optimize globally:
  *
  *   quality gate (min word count) → language gate (marker-score
  *   argmax = en) → exact dedup (first doc_id per content
  *   fingerprint) → stable projection.
  *
  * Scale shape: the gates are narrow scan-side filters (they reach the
  * parquet scan before any shuffle); the only shuffle is the dedup's
  * partition-by-fingerprint — applied LAST, so it shuffles only
  * surviving rows. At 100 TB the gates typically drop the majority of
  * the corpus before anything moves over the network.
  */
object PrepPipeline {

  /** Deterministic train/val/test assignment by CONTENT hash: the
    * split survives re-crawls, re-sharding, and engine changes (the
    * portable hash evaluates identically everywhere), and identical
    * texts always land in the same split — the property that prevents
    * train/eval leakage through duplicates, which row-number or
    * random sampling both violate. Thresholds are percent buckets of
    * `portableHash60(text) % 100`. */
  def splitAssignment(docs: DataFrame, trainPct: Int = 90,
                      valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100)
    val bucket = portableHash60(col("text")) % 100
    docs.select(col("doc_id"), bucket.as("bucket"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** q39: gated + deduped corpus with per-doc metadata. */
  def prepQuery(spark: SparkSession, dir: String,
                minWords: Long = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val en = langScore(col("text"), "en")
    val fr = langScore(col("text"), "fr")
    val es = langScore(col("text"), "es")
    val de = langScore(col("text"), "de")
    val w = Window.partitionBy("fp").orderBy("doc_id")
    docs
      .withColumn("n_words", size(rawTokens(col("text"))).cast("long"))
      .filter(col("n_words") >= minWords)
      // language gate: the argmax-with-precedence 'en' branch
      .filter(en >= fr && en >= es && en >= de)
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("fp"), col("n_words"))
      .orderBy("doc_id")
  }
}
