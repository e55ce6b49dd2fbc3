package graft

import org.apache.spark.sql.functions._
import graft.streaming.PackStream

class PackStreamSpec extends SparkSpec {

  test("streaming packer equals the batch packing arithmetic after a " +
    "multi-batch drain (state carries offsets across batches)") {
    val streamed = PackStream.streamPackingQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Packing
      .contextWindowsQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"first diff: ${streamed.zip(batch).find(p => p._1 != p._2)}")
  }

  test("offset state survives a PROCESS restart: a second drain from " +
    "the same checkpoint continues the window numbering") {
    import java.nio.file.{Files, Paths}
    val drop = tmpDir("pack_drop")
    val out = tmpDir("pack_out")
    val ckpt = tmpDir("pack_ckpt")
    def doc(id: Long, n: Int) =
      s"""{"doc_id":$id,"ts":"2024-01-01T00:00:0${id % 10}Z","text":"${
        Seq.fill(n)("t").mkString(" ")}","source":"s0"}"""
    // phase 1: 100 tokens -> doc 1 fills [0, 100) of window 0
    Files.write(Paths.get(drop, "a.json"), doc(1, 100).getBytes("UTF-8"))
    PackStream.packAvailableNow(spark, drop, out, ckpt)
    // phase 2 = a NEW query instance on the SAME checkpoint: doc 2's
    // 50 tokens must start at offset 100 and split into window 1 —
    // which can only happen if the state store restored cum = 100
    Files.write(Paths.get(drop, "b.json"), doc(2, 50).getBytes("UTF-8"))
    PackStream.packAvailableNow(spark, drop, out, ckpt)
    val m = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("first_window"), r.getAs[Long]("window_offset"),
          r.getAs[Long]("n_windows"), r.getAs[Int]("is_split")))
      .toMap
    assert(m(1L) == ((0L, 0L, 1L, 0)))
    assert(m(2L) == ((0L, 100L, 2L, 1)),
      "restart must resume from cum=100, not reset to 0")
  }

  test("cross-batch continuation is real: a later window id only " +
    "exists because state survived the batch boundary") {
    // at sf0.001 each source's corpus spans multiple 128-token
    // windows across the 3-micro-batch drain; if state were reset
    // per batch, offsets would collapse back toward zero and SOME
    // doc's first_window would disagree with the batch arithmetic —
    // covered by the equality above. Here: assert the drain really
    // produced window ids beyond 0 (the continuation has teeth).
    val streamed = PackStream.streamPackingQuery(spark, sf0001)
    assert(streamed.agg(max(col("first_window"))).head().getLong(0) > 0L)
  }
}
