package graft

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("context windows: offsets, spans, and split flags are the " +
    "concat-stream arithmetic") {
    // one source, C = 128: docs of 100 / 50 / 120 / 6 tokens
    //   doc 1: [0, 100)    -> window 0, offset 0,   1 window,  unsplit
    //   doc 2: [100, 150)  -> window 0, offset 100, 2 windows, split
    //   doc 3: [150, 270)  -> window 1, offset 22,  2 windows, split
    //   doc 4: [270, 276)  -> window 2, offset 14,  1 window,  unsplit
    def doc(id: Long, n: Int) =
      (id, Seq.fill(n)("t").mkString(" "), "s0")
    val docs = Seq(doc(1, 100), doc(2, 50), doc(3, 120), doc(4, 6))
      .toDF("doc_id", "text", "source")
    val m = Packing.contextWindows(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))
      .toMap
    assert(m(1L) == ((0L, 0L, 1L, 0)))
    assert(m(2L) == ((0L, 100L, 2L, 1)))
    assert(m(3L) == ((1L, 22L, 2L, 1)))
    assert(m(4L) == ((2L, 14L, 1L, 0)))
  }

  test("context windows: streams are independent per source") {
    def doc(id: Long, n: Int, src: String) =
      (id, Seq.fill(n)("t").mkString(" "), src)
    val docs = Seq(doc(1, 200, "a"), doc(2, 10, "b"))
      .toDF("doc_id", "text", "source")
    val m = Packing.contextWindows(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // doc 2 starts source b's own stream at window 0, offset 0 —
    // unaffected by source a's 200 tokens
    assert(m(2L) == ((0L, 0L)))
    assert(m(1L) == ((0L, 0L)))
  }
}
