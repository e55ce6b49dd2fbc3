package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * One parquet file per table under the `/root/testdata/sfN` dirs. These play the
  * roles of the reference's SEC tables per FIXTURES.md §B (e.g. `orders`
  * stands in for `sub`, `lineitem` for `num`). Reading a partitioned
  * parquet directory is the 100 TB-scale layout; at test scale each table
  * is a single file — the code path is identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet's `ts` encoding has drifted across testdata generations:
    * TIMESTAMP(NANOS) (which Spark's parquet reader rejects by default with
    * PARQUET_TYPE_ILLEGAL), then TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (surfacing as TIMESTAMP_NTZ). Dispatch on the actual read schema so all
    * encodings yield one canonical µs TimestampType frame:
    *   - LongType (nanos read via legacy conf): exact div-1000 to µs — the
    *     testdata is µs-granular, so truncation is lossless;
    *   - TIMESTAMP_NTZ: cast to TimestampType — lossless under the UTC
    *     session timezone every entrypoint sets;
    *   - TimestampType: pass through.
    * The legacy nanosAsLong conf is only flipped when the plain read rejects
    * the file, never unconditionally (a read helper must not silently mutate
    * session-wide state).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df =
      try table(s, d, "events")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getMessage).exists(_.contains("Parquet")) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, d, "events")
      }
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view — the rebuild's analogue
    * of the reference's schema-qualified Snowflake tables, enabling the
    * free-form SQL passthrough surface (reference backend/main.py:109-134).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
