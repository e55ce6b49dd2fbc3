package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's five FastAPI serving endpoints as DataFrame
  * functions (reference backend/main.py). The HTTP/warehouse layers
  * collapse: each endpoint is a pure query over registered tables, and
  * the free-form SQL surface is spark.sql over temp views (§2.11).
  *
  * The reference's dispatch bugs are deliberately fixed, not
  * replicated (SURVEY §7.4): consistent source-name casing, no
  * reference to a never-created table, no broken connection calls.
  */
object SecServing {

  /** A1: availability check — row count for a quarter partition
    * (backend/main.py:50-57). With data partitioned by source_file this
    * prunes to one partition. */
  def availability(df: DataFrame, sourceFile: String): Long =
    df.filter(col("source_file") === sourceFile).count()

  /** S14: table introspection + sample (backend/main.py:90-98). */
  def tableInfo(df: DataFrame, sampleRows: Int = 3): (Seq[(String, String)], DataFrame) =
    (df.schema.fields.toIndexedSeq.map(f => f.name -> f.dataType.simpleString),
      df.limit(sampleRows))

  /** J1+P3+O1: the RAW-source statement query (backend/main.py:163-176):
    * sub⋈pre on adsh, ⋈num on (adsh, tag, version) — note `version` IS
    * part of this join key, unlike the fact build's J2 — filter stmt,
    * project the 16 serving columns, order by (adsh, line). */
  def statementQuery(sub: DataFrame, pre: DataFrame, num: DataFrame,
                     stmtType: String): DataFrame =
    statementQuery(sub, pre, num, Seq(stmtType))

  /** [[statementQuery]] accepting a FAMILY of stmt codes — real SEC
    * data writes the income statement as both `IC` and `IS` (the
    * reference's own data:is/data:ic drift, SURVEY §7.4), so the
    * serving layer matches either rather than replicating the split. */
  def statementQuery(sub: DataFrame, pre: DataFrame, num: DataFrame,
                     stmtTypes: Seq[String]): DataFrame =
    sub.as("s")
      .join(pre.as("p"), col("s.adsh") === col("p.adsh"))
      .join(num.as("n"),
        col("p.adsh") === col("n.adsh") && col("p.tag") === col("n.tag")
          && col("p.version") === col("n.version"))
      .filter(col("p.stmt").isin(stmtTypes: _*))
      .select(
        col("s.adsh"), col("s.cik"), col("s.name"), col("s.sic"),
        col("s.countryba"), col("s.fye"), col("s.form"), col("s.period"),
        col("s.fy"), col("s.fp"), col("p.report"), col("p.line"),
        col("p.stmt"), col("p.plabel"), col("n.ddate"), col("n.qtrs"),
        col("n.uom"), col("n.value"))
      .orderBy(col("s.adsh"), col("p.line"))

  /** §2.11: free-form SQL passthrough. Views named to the reference's
    * convention (`sec_num_2023Q4`, …) so user SQL ports verbatim;
    * Spark's parser/analyzer/optimizer replaces Snowflake's. */
  def registerQuarterViews(spark: SparkSession, quarter: String,
                           tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) =>
      df.createOrReplaceTempView(s"sec_${name}_$quarter")
    }

  def executeSql(spark: SparkSession, query: String): DataFrame =
    spark.sql(query)

  /** S12, persistent flavor: the reference creates real schemas and
    * tables that outlive one session (snowflake_raw_data_loader.py:
    * 36-206 — `CREATE SCHEMA`/`CREATE TABLE` in a durable warehouse).
    * [[registerQuarterViews]] covers the session-scoped surface; this
    * writes managed parquet tables into a named database via the
    * catalog, so the SQL surface survives a session restart and is
    * visible to concurrent sessions sharing the metastore. Optional
    * `partitionBy` keeps quarter-partition pruning available at scale.
    * Returns the fully-qualified names written.
    */
  def persistQuarterTables(spark: SparkSession, quarter: String,
                           tables: Map[String, DataFrame],
                           database: String = "sec",
                           partitionBy: Seq[String] = Nil): Seq[String] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    tables.toSeq.map { case (name, df) =>
      val fqn = s"$database.sec_${name}_$quarter"
      val writer = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .saveAsTable(fqn)
      fqn
    }
  }
}
