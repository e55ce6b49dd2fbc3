package graft

import java.nio.file.{Files, Paths}
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  private def writeDrop(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))

  test("AvailableNow file ingest processes the drop dir exactly once") {
    val drop = tmpDir("stream_drop")
    val out = tmpDir("stream_out")
    val ckpt = tmpDir("stream_ckpt")
    writeDrop(drop, "batch1.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10Z","user_id":7,"event_type":"click","value":1.5}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:40Z","user_id":7,"event_type":"view","value":2.5}""",
      """{"event_id":3,"ts":"2024-01-01T00:01:10Z","user_id":8,"event_type":"click","value":3.0}"""))
    EventStream.ingestAvailableNow(spark, drop, out, ckpt)
    assert(spark.read.parquet(out).count() == 3)
    // second invocation with same checkpoint: no new files -> no new rows
    EventStream.ingestAvailableNow(spark, drop, out, ckpt)
    assert(spark.read.parquet(out).count() == 3)
    // new drop arrives -> only it is processed (incremental semantics)
    writeDrop(drop, "batch2.json", Seq(
      """{"event_id":4,"ts":"2024-01-01T00:02:05Z","user_id":9,"event_type":"purchase","value":9.9}"""))
    EventStream.ingestAvailableNow(spark, drop, out, ckpt)
    assert(spark.read.parquet(out).count() == 4)
  }

  test("watermarked windowed aggregation groups by event-time minute") {
    val drop = tmpDir("stream_drop2")
    val ckpt = tmpDir("stream_ckpt2")
    writeDrop(drop, "b.json", Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:10Z","user_id":1,"event_type":"click","value":1.0}""",
      """{"event_id":2,"ts":"2024-01-01T00:00:50Z","user_id":2,"event_type":"click","value":2.0}""",
      """{"event_id":3,"ts":"2024-01-01T00:01:10Z","user_id":3,"event_type":"click","value":4.0}"""))
    EventStream.aggregateAvailableNow(spark, drop, "win_counts", ckpt)
    val rows = spark.sql(
      "SELECT window_start, n, sum_value FROM win_counts ORDER BY window_start")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 3.0)
    assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 4.0)
  }
}
