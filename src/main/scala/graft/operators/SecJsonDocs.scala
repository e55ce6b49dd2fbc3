package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-company JSON document pipeline, re-expressed as set operations
  * (reference airflow/dags/ext_zip_convert_into_json_store.py).
  *
  * The reference iterates submissions one at a time, re-scanning
  * chunked num/pre/tag frames per submission (lines 180-193) —
  * O(subs×chunks). The scalable rewrite is the groupBy/collect_list
  * formulation (SURVEY §7.4): joins + one aggregation, no driver loop.
  *
  * Semantics preserved:
  *   - P9 skips: submissions with null/unparseable yyyymmdd `period`
  *     are dropped (lines 79-89);
  *   - J4: cik→symbol broadcast lookup, miss → "UNKNOWN" (lines 66-77);
  *   - P8 defaults: country miss → "UNKNOWN", value NaN → 0
  *     (lines 77, 94-101);
  *   - J5 first-match lookups: the first matching tag row supplies the
  *     info doc, the first matching (adsh,tag) pre row supplies
  *     (plabel, stmt) — `.values[0]` semantics (lines 107-123) become
  *     min-keyed dedup before the join, so rows never multiply;
  *   - F10 stmt→bucket mapping BS/CF/(IC|IS)→bs/cf/ic (lines 134-139);
  *   - F5 date formatting yyyymmdd int → yyyy-MM-dd string (lines 84-86).
  */
object SecJsonDocs {

  private def yyyymmddToIso(c: org.apache.spark.sql.Column) =
    date_format(to_date(c.cast("string"), "yyyyMMdd"), "yyyy-MM-dd")

  /** Assemble one nested document row per submission. */
  def buildDocs(num: DataFrame, sub: DataFrame, pre: DataFrame,
                tag: DataFrame, ticker: DataFrame): DataFrame = {
    // P9: drop submissions whose period is not a valid yyyymmdd date.
    val subOk = sub.filter(col("period").isNotNull &&
      to_date(col("period").cast("string"), "yyyyMMdd").isNotNull)

    // J4: broadcast symbol lookup with UNKNOWN default. The reference
    // keeps the first ticker row per cik (iloc[0]); min(symbol) is the
    // deterministic equivalent.
    val tick = ticker.groupBy("cik").agg(min("symbol").as("symbol"))
    val subWithSym = subOk.join(broadcast(tick), Seq("cik"), "left")
      .withColumn("symbol", coalesce(col("symbol"), lit("UNKNOWN")))

    // J5: first-match dims, deduped before joining so the fact side
    // never fans out (reference takes .values[0] of the first match).
    // Mapping per reference lines 107-123: label ← tag.doc,
    // info ← pre.plabel, stmt ← pre.stmt.
    val tagFirst = tag.groupBy("tag")
      .agg(min(col("doc")).as("doc_label"))
    val preFirst = pre.groupBy("adsh", "tag")
      .agg(min(col("plabel")).as("plabel"), min(col("stmt")).as("stmt"))

    val facts = num
      .join(tagFirst, Seq("tag"), "left")
      .join(preFirst, Seq("adsh", "tag"), "left")
      .withColumn("label", coalesce(col("doc_label"), lit("Unknown")))
      .withColumn("stmt", coalesce(col("stmt"), lit("UNKNOWN")))
      .withColumn("info", coalesce(col("plabel"), lit("Unknown")))
      // P8: NaN/null value → 0 (reference line 94-101).
      .withColumn("value",
        coalesce(col("value").cast("double"), lit(0.0)))
      // F10: stmt → document bucket.
      .withColumn("bucket",
        when(col("stmt") === "BS", "bs")
          .when(col("stmt") === "CF", "cf")
          .when(col("stmt").isin("IC", "IS"), "ic")
          .otherwise(lit(null)))
      .withColumn("element", struct(
        col("label"), col("tag").as("concept"), col("info"),
        col("uom").as("unit"), col("value")))

    // F9: one groupBy + conditional collect_list replaces the per-
    // submission append loop. Element order inside a bucket is made
    // deterministic by sorting on (concept, unit, value).
    val docsData = facts.groupBy("adsh").agg(
      array_sort(collect_list(when(col("bucket") === "bs", col("element"))))
        .as("bs"),
      array_sort(collect_list(when(col("bucket") === "cf", col("element"))))
        .as("cf"),
      array_sort(collect_list(when(col("bucket") === "ic", col("element"))))
        .as("ic"))

    // Field set mirrors the reference doc exactly (lines 92-102):
    // quarter = str(fp) (a null fp becomes the string "nan" in pandas —
    // quirk preserved), year = int(fy) with 0 default, and
    // startDate == endDate == period (reference lines 84-88).
    subWithSym.join(docsData, Seq("adsh"), "left")
      .select(
        col("adsh"),
        col("symbol"),
        col("name"),
        coalesce(col("fp").cast("string"), lit("nan")).as("quarter"),
        coalesce(col("fy"), lit(0L)).cast("int").as("year"),
        coalesce(col("countryma"), lit("UNKNOWN")).as("country"),
        coalesce(col("cityma"), lit("UNKNOWN")).as("city"),
        yyyymmddToIso(col("period")).as("endDate"),
        yyyymmddToIso(col("period")).as("startDate"),
        struct(
          coalesce(col("bs"), array().cast("array<struct<label:string,concept:string,info:string,unit:string,value:double>>")).as("bs"),
          coalesce(col("cf"), array().cast("array<struct<label:string,concept:string,info:string,unit:string,value:double>>")).as("cf"),
          coalesce(col("ic"), array().cast("array<struct<label:string,concept:string,info:string,unit:string,value:double>>")).as("ic"))
          .as("data"))
  }

  /** F7/F8: the LATERAL FLATTEN statement views
    * (reference load_json_data_snowflake.py:217-257) — explode one
    * bucket array into rows. `bucket` ∈ {bs, cf, ic}. */
  def statementView(docs: DataFrame, bucket: String): DataFrame =
    docs.select(
      col("adsh"), col("symbol"), col("name"),
      explode(col(s"data.$bucket")).as("e"))
      .select(col("adsh"), col("symbol"), col("name"),
        col("e.label").as("label"), col("e.concept").as("concept"),
        col("e.unit").as("unit"), col("e.value").as("value"))

  /** §1.1 VARIANT parity (q248): the reference stores each document
    * as an UNTYPED Snowflake `VARIANT` column (`raw_json`,
    * load_json_data_snowflake.py:126-161) and every view
    * LATERAL-FLATTENs paths out of it (`raw_json:data:bs`). q166
    * models the typed-struct route the survey recommended; this is
    * the native analogue now that Spark has a VARIANT type:
    * `to_json → parse_json` yields the same untyped raw_json column,
    * `variant_get` extracts typed scalars and the statement array BY
    * PATH, `explode` flattens. Emitting exactly q166's view under the
    * same oracle proves the untyped route loses nothing against the
    * declared-schema route — the Snowflake-semantics guarantee a
    * migrating user needs.
    *
    * Scale shape: parse_json/variant_get are codegen'd expressions on
    * the scan projection — no shuffle is added over q166's plan; the
    * variant binary encoding (not re-parsed JSON text) is what each
    * path access reads. */
  def variantFlattenView(docs: DataFrame): DataFrame = {
    val entry = "struct<label:string,concept:string,info:string," +
      "unit:string,value:double>"
    docs
      .select(parse_json(to_json(struct(
        col("adsh"), col("symbol"), col("name"), col("data"))))
        .as("raw_json"))
      .select(
        variant_get(col("raw_json"), "$.adsh", "string").as("adsh"),
        variant_get(col("raw_json"), "$.symbol", "string").as("symbol"),
        variant_get(col("raw_json"), "$.name", "string").as("name"),
        explode(variant_get(col("raw_json"), "$.data.bs",
          s"array<$entry>")).as("e"))
      .select(col("adsh"), col("symbol"), col("name"),
        col("e.label").as("label"), col("e.concept").as("concept"),
        col("e.unit").as("unit"), col("e.value").as("value"))
  }

  /** J6: the self-MERGE that collapses the company table to one row per
    * symbol, last write wins (reference load_json_data_snowflake.py:
    * 165-187). Batch equivalent: latest row per symbol by (endDate,
    * adsh) window. Note the reference quirk this reproduces: every
    * company whose cik has no ticker shares symbol "UNKNOWN" and
    * collapses to a single row. */
  def companyMerge(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol")
      .orderBy(col("endDate").desc, col("adsh").desc)
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }
}
