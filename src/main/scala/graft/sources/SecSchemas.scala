package graft.sources

import org.apache.spark.sql.types._

/** Canonical Spark schemas for the SEC Financial Statement Data Sets
  * tables, derived from the reference's Snowflake DDL
  * (reference airflow/dags/snowflake_raw_data_loader.py:63-158) with the
  * type mapping of SURVEY.md §1.2: NUMBER(38,0)→LongType, NUMBER(1,0)
  * flags→IntegerType, NUMBER(8,0) yyyymmdd dates→IntegerType,
  * NUMBER(38,10) fact value→DecimalType(38,10), VARCHAR/CHAR/TEXT→
  * StringType, the `accepted` timestamp kept as text (the reference
  * never parses it, snowflake_raw_data_loader.py:111).
  *
  * Declared schemas everywhere — never inferSchema (the reference
  * hard-codes headers and types, zip_ext_and_parq_store.py:33-127).
  */
object SecSchemas {

  /** sub.txt — submission header, PK adsh (one row per filing). */
  val sub: StructType = StructType(Seq(
    StructField("adsh", StringType),
    StructField("cik", LongType),
    StructField("name", StringType),
    StructField("sic", LongType),
    StructField("countryba", StringType),
    StructField("stprba", StringType),
    StructField("cityba", StringType),
    StructField("zipba", StringType),
    StructField("bas1", StringType),
    StructField("bas2", StringType),
    StructField("baph", StringType),
    StructField("countryma", StringType),
    StructField("stprma", StringType),
    StructField("cityma", StringType),
    StructField("zipma", StringType),
    StructField("mas1", StringType),
    StructField("mas2", StringType),
    StructField("countryinc", StringType),
    StructField("stprinc", StringType),
    StructField("ein", LongType),
    StructField("former", StringType),
    StructField("changed", LongType),
    StructField("afs", StringType),
    StructField("wksi", IntegerType),
    StructField("fye", LongType),
    StructField("form", StringType),
    StructField("period", LongType),
    StructField("fy", LongType),
    StructField("fp", StringType),
    StructField("filed", LongType),
    StructField("accepted", StringType),
    StructField("prevrpt", IntegerType),
    StructField("detail", IntegerType),
    StructField("instance", StringType),
    StructField("nciks", LongType),
    StructField("aciks", StringType)))

  /** num.txt — numeric facts (dup-prone composite key). */
  val num: StructType = StructType(Seq(
    StructField("adsh", StringType),
    StructField("tag", StringType),
    StructField("version", StringType),
    StructField("ddate", IntegerType),
    StructField("qtrs", LongType),
    StructField("uom", StringType),
    StructField("segments", StringType),
    StructField("coreg", StringType),
    StructField("value", DecimalType(38, 10)),
    StructField("footnote", StringType)))

  /** pre.txt — statement presentation/placement. */
  val pre: StructType = StructType(Seq(
    StructField("adsh", StringType),
    StructField("report", LongType),
    StructField("line", LongType),
    StructField("stmt", StringType),
    StructField("inpth", IntegerType),
    StructField("rfile", StringType),
    StructField("tag", StringType),
    StructField("version", StringType),
    StructField("plabel", StringType),
    StructField("negating", IntegerType)))

  /** tag.txt — taxonomy dimension. */
  val tag: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("version", StringType),
    StructField("custom", IntegerType),
    StructField("abstract", IntegerType),
    StructField("datatype", StringType),
    StructField("iord", StringType),
    StructField("crdr", StringType),
    StructField("tlabel", StringType),
    StructField("doc", StringType)))

  /** ticker.txt — headerless symbol↔cik lookup (12k rows, broadcast). */
  val ticker: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("cik", LongType)))

  /** Statement-element of the per-company JSON document
    * (reference ext_zip_convert_into_json_store.py:92-139). */
  val docElement: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("concept", StringType),
    StructField("info", StringType),
    StructField("unit", StringType),
    StructField("value", DoubleType)))

  /** Per-company nested JSON document. */
  val companyDoc: StructType = StructType(Seq(
    StructField("quarter", StringType),
    StructField("country", StringType),
    StructField("data", StructType(Seq(
      StructField("bs", ArrayType(docElement)),
      StructField("cf", ArrayType(docElement)),
      StructField("ic", ArrayType(docElement))))),
    StructField("year", IntegerType),
    StructField("name", StringType),
    StructField("startDate", StringType),
    StructField("endDate", StringType),
    StructField("symbol", StringType),
    StructField("city", StringType)))

  /** Fact-table output shape (reference streamlit_app.py:142-156,
    * produced by models/fact_data_load/_load.sql:37-53). */
  val fact: StructType = StructType(Seq(
    StructField("adsh", StringType),
    StructField("cik", LongType),
    StructField("company_name", StringType),
    StructField("filing_date", LongType),
    StructField("fiscal_year", LongType),
    StructField("fiscal_period", StringType),
    StructField("tag", StringType),
    StructField("unit_of_measure", StringType),
    StructField("report_date", IntegerType),
    StructField("qtrs", LongType),
    StructField("statement_type", StringType),
    StructField("plabel", StringType),
    StructField("total_value", DecimalType(38, 10))))

  /** Valid stmt codes (reference models/staging/schema.yml:272-274). */
  val stmtCodes: Seq[String] = Seq("BS", "IS", "CF", "EQ", "CI", "UN", "CP", "SI")
}
