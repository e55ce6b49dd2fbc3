package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

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

  /** Engine-neutral names for the types the testdata surface uses, so
    * [[tableInfoQuery]]'s output is comparable across engines (Spark
    * says `int`/`string`/`array<float>` where DuckDB says
    * `INTEGER`/`VARCHAR`/`FLOAT[]` for the same parquet column). */
  private val CanonicalTypes = Map(
    "int" -> "int32", "bigint" -> "int64", "string" -> "text",
    "float" -> "float32", "double" -> "float64", "date" -> "date",
    "timestamp" -> "timestamp", "array<float>" -> "list<float32>",
    "array<double>" -> "list<float64>")

  /** q213: S14 as an oracle-checked query — the DESCRIBE-equivalent
    * over two testdata tables (nation: scalar types; embeddings: the
    * vector column) plus the first 3 nation rows rendered as strings.
    * Both halves go through [[tableInfo]] — the same (schema, sample)
    * pair the serving route returns — with the sample DETERMINISTIC
    * (ordered by key before the limit) and every value canonicalized
    * so DuckDB re-derives the identical rows from the same parquet
    * via information_schema + its own scan. */
  def tableInfoQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tables = Seq("nation" -> Tables.nation(spark, dir),
      "embeddings" -> Tables.embeddings(spark, dir))
    val colRows = tables.flatMap { case (t, df) =>
      tableInfo(df)._1.zipWithIndex.map { case ((n, ty), i) =>
        (t, "column", (i + 1).toLong, n, CanonicalTypes.getOrElse(ty, ty))
      }
    }.toDF("tbl", "section", "ord", "name", "value")
    val sample = tableInfo(Tables.nation(spark, dir)
        .orderBy("n_nationkey"))._2
      .select(lit("nation").as("tbl"), lit("sample").as("section"),
        (col("n_nationkey") + 1).cast("long").as("ord"),
        lit("row").as("name"),
        concat_ws("|", col("n_nationkey").cast("string"), col("n_name"),
          col("n_regionkey").cast("string")).as("value"))
    colRows.unionAll(sample).orderBy("tbl", "section", "ord")
  }

  /** DuckDB oracle for [[tableInfoQuery]]. */
  def tableInfoOracleSql: String =
    """WITH cols AS (SELECT table_name AS tbl, 'column' AS section,
           CAST(ordinal_position AS BIGINT) AS ord, column_name AS name,
           CASE data_type
             WHEN 'INTEGER' THEN 'int32' WHEN 'BIGINT' THEN 'int64'
             WHEN 'VARCHAR' THEN 'text' WHEN 'FLOAT' THEN 'float32'
             WHEN 'DOUBLE' THEN 'float64' WHEN 'DATE' THEN 'date'
             WHEN 'TIMESTAMP' THEN 'timestamp'
             WHEN 'FLOAT[]' THEN 'list<float32>'
             WHEN 'DOUBLE[]' THEN 'list<float64>'
             ELSE lower(data_type) END AS value
         FROM information_schema.columns
         WHERE table_name IN ('nation', 'embeddings')),
       samp AS (SELECT 'nation' AS tbl, 'sample' AS section,
           CAST(n_nationkey + 1 AS BIGINT) AS ord, 'row' AS name,
           concat_ws('|', CAST(n_nationkey AS VARCHAR), n_name,
             CAST(n_regionkey AS VARCHAR)) AS value
         FROM (SELECT * FROM nation ORDER BY n_nationkey LIMIT 3))
     SELECT * FROM cols UNION ALL SELECT * FROM samp
     ORDER BY tbl, section, ord"""

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
