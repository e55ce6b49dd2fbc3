package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PII scrubbing over heterogeneous payloads — the privacy gate of a
  * training-data pipeline: count pattern hits (numeric identifiers,
  * email addresses) per record and emit the digest of the redacted
  * payload, so downstream stages can verify they only ever saw
  * scrubbed content. Patterns use constructions with identical
  * semantics in every regex engine (no lookaround, no word-boundary
  * dialect differences).
  *
  * Narrow projection over each source, then a union — no shuffle
  * before the output sort; at 100 TB redaction runs at scan speed per
  * source and sources scrub independently.
  */
object Redaction {

  private val idPattern = "[0-9]+"
  private val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"

  /** Redaction report over the event props (JSON payloads with
    * numeric values) and customer names (entity ids embedded in
    * text): per record, hit counts and the md5 of the payload with
    * every match replaced by '#'. */
  def redactQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir).select(
      lit("events").as("src"), col("event_id").as("rec_id"),
      col("props").as("payload"))
    val customers = Tables.customer(spark, dir).select(
      lit("customer").as("src"), col("c_custkey").as("rec_id"),
      col("c_name").as("payload"))
    events.unionByName(customers)
      .select(col("src"), col("rec_id"),
        regexp_count(col("payload"), lit(idPattern)).cast("long").as("n_ids"),
        regexp_count(col("payload"), lit(emailPattern)).cast("long")
          .as("n_emails"),
        md5(regexp_replace(
          regexp_replace(col("payload"), emailPattern, "#"),
          idPattern, "#")).as("redacted_md5"))
      .orderBy("src", "rec_id")
  }
}
