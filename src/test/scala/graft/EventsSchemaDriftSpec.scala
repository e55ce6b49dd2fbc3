package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** The driver's testdata has already changed the on-disk encoding of
  * `events.ts` once mid-build (TIMESTAMP(NANOS) → TIMESTAMP(MICROS,
  * isAdjustedToUTC=false)), which zeroed the whole events query family
  * for a round. This spec pins `Tables.events` to a schema-adaptive
  * contract: the SAME canonical µs-TimestampType frame must come back
  * from every encoding the generator has produced or could plausibly
  * produce next:
  *   - epoch-nanos stored as a plain INT64 column (LongType branch),
  *   - true parquet TIMESTAMP(NANOS) annotation, which Spark rejects at
  *     schema inference without the legacy conf (retry branch),
  *   - TIMESTAMP(MICROS) NTZ (TimestampNTZType branch),
  *   - TIMESTAMP(MICROS) UTC-adjusted (TimestampType pass-through).
  */
class EventsSchemaDriftSpec extends SparkSpec {

  // one µs-granular instant per row; nanos values are exact ×1000
  private val rows = Seq(
    (1L, 1700000000000000L, 10L, "view", 1.5, "{}"),
    (2L, 1700000000500000L, 10L, "click", 2.5, "{}"),
    (3L, 1700000001000000L, 11L, "purchase", 9.0, "{\"a\":1}"))

  private def canonical(df: DataFrame): Seq[(Long, Long, Long, String, Double, String)] = {
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must canonicalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))
      .sortBy(_._1).toSeq
  }

  private val expected = rows.sortBy(_._1)

  test("plain INT64 epoch-nanos column reads via the LongType branch") {
    import spark.implicits._
    val dir = tmpDir("ev_long")
    rows.map { case (id, us, uid, et, v, p) => (id, us * 1000L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(canonical(Tables.events(spark, dir)) == expected)
  }

  test("TIMESTAMP(MICROS) NTZ reads via the TimestampNTZType cast branch") {
    import spark.implicits._
    val dir = tmpDir("ev_ntz")
    rows.map { case (id, us, uid, et, v, p) =>
        (id, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
          ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC),
          uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType, "fixture must be NTZ")
    assert(canonical(Tables.events(spark, dir)) == expected)
  }

  test("TIMESTAMP(MICROS) UTC-adjusted passes through unchanged") {
    import spark.implicits._
    val dir = tmpDir("ev_utc")
    rows.map { case (id, us, uid, et, v, p) =>
        (id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          us / 1000000L, (us % 1000000L) * 1000L)), uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(canonical(Tables.events(spark, dir)) == expected)
  }

  test("plain INT64 epoch-MICROS drift reads correctly via magnitude dispatch") {
    // the guard ADVICE r8 asked for: if the generator drifts a third
    // time to INT64-micros, the LongType branch must NOT divide by 1000
    import spark.implicits._
    val dir = tmpDir("ev_long_us")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(canonical(Tables.events(spark, dir)) == expected)
  }

  test("true TIMESTAMP(NANOS) annotation triggers the legacy-conf retry") {
    val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try {
      val dir = tmpDir("ev_nanos")
      writeTrueNanosFixture(s"$dir/events.parquet")
      // plain read must reject the annotation — that's what the retry is for
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.read.parquet(s"$dir/events.parquet").schema("ts")
      }
      // the retry must not leak the legacy conf into the session: after
      // the helper returns, the conf reads back exactly as before the
      // call (the unset conf surfaces its registered default "false")
      val before = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      assert(canonical(Tables.events(spark, dir)) == expected)
      assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") == before,
        "events() must restore nanosAsLong after the fallback read")
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    }
  }

  /** Writes the fixture with parquet-hadoop directly — Spark itself cannot
    * produce a TIMESTAMP(NANOS) column, which is exactly why the reader
    * needs the legacy-conf retry path.
    */
  private def writeTrueNanosFixture(file: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.hadoop.fs.Path

    val schema = Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val writer = ExampleParquetWriter.builder(new Path(file))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, us, uid, et, v, p) =>
      val g = gf.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L)
      g.add("user_id", uid)
      g.add("event_type", et)
      g.add("value", v)
      g.add("props", p)
      writer.write(g)
    } finally writer.close()
  }
}
