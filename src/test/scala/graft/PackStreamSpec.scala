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
