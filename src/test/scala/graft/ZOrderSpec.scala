package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave for the property check. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zkey matches a reference Morton interleave") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val out = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zkey(col("x"), col("y"), bits = 5))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(out((x, y)) == mortonRef(x, y, 5), s"($x,$y)")
    }
  }

  test("z-curve locality: sorted z-ranges bound both dimensions") {
    // 64x64 grid split into 64 equal z-ranges: each range must span at
    // most a 8x8 tile in (x, y) — the property that makes min/max file
    // stats prune on EITHER dimension
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val ranges = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zkey(col("x"), col("y"), bits = 6))
      .withColumn("bucket", expr("z div 64"))
      .groupBy("bucket")
      .agg(min("x").as("mnx"), max("x").as("mxx"),
        min("y").as("mny"), max("y").as("mxy"))
      .collect()
    assert(ranges.length == 64)
    ranges.foreach { r => // columns: bucket, mnx, mxx, mny, mxy
      assert(r.getLong(2) - r.getLong(1) <= 7, "x span must stay tile-bounded")
      assert(r.getLong(4) - r.getLong(3) <= 7, "y span must stay tile-bounded")
    }
  }

  test("zorderLayout range-partitions by the z key") {
    val df = (0L until 1000L).map(i => (i % 37, i % 53)).toDF("a", "b")
    val laid = ZOrder.zorderLayout(df, "a", "b", partitions = 8, bits = 6)
    val p = laid.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      "layout must range-partition on the z key:\n" + p.take(600))
    assert(laid.count() == 1000L)
  }

  /** In-test reference xy2d (the canonical recurrence, n−1
    * reflection) — what the unrolled column expression must equal. */
  private def refHilbert(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    val n1 = (1L << bits) - 1L
    for (i <- (bits - 1) to 0 by -1) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += (1L << (2 * i)) * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val (xr, yr) = if (rx == 1L) (n1 - x, n1 - y) else (x, y)
        x = yr; y = xr
      }
    }
    d
  }

  test("hkey is a bijection onto [0, 4^bits) with unit-step adjacency") {
    graft.functions.CurveFunctions.register(spark)
    val bits = 4
    val n = 1 << bits
    val grid = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = grid.withColumn("h", ZOrder.hkey(col("x"), col("y"), bits))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1)))
      .toMap
    assert(got.keySet == (0L until (n.toLong * n)).toSet)
    (0L until n.toLong * n - 1).foreach { d =>
      val ((x1, y1), (x2, y2)) = (got(d), got(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve must step one cell at d=$d")
    }
  }

  test("hkey at full width matches the reference recurrence") {
    graft.functions.CurveFunctions.register(spark)
    val bits = 10
    val pts = (0 until 500)
      .map(i => ((i * 131L) % (1L << bits), (i * 197L) % (1L << bits)))
      .toDF("x", "y")
    val rows = pts.withColumn("h", ZOrder.hkey(col("x"), col("y"), bits))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == refHilbert(bits, r.getLong(0), r.getLong(1)))
    }
  }

  test("hilbertLayout range-partitions by the hilbert key") {
    val df = (0L until 1000L).map(i => (i % 37, i % 53)).toDF("a", "b")
    val laid = ZOrder.hilbertLayout(df, "a", "b", partitions = 8, bits = 6)
    val p = laid.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      "layout must range-partition on the hilbert key:\n" + p.take(600))
    assert(laid.count() == 1000L)
  }

  test("hilbert beats morton on UNALIGNED key windows (the case file " +
    "splits actually hit)") {
    // aligned 4^k ranges are quadrants for BOTH curves; the Hilbert
    // advantage is unaligned ranges — a scan's file split rarely
    // lands on a 4^k boundary. Sum of (x-span + y-span) bounding
    // boxes over sliding key windows, pure reference arithmetic:
    val bits = 5; val n = 1 << bits
    def refMorton(x: Long, y: Long): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .sum
    def spanSum(inv: Map[Long, (Long, Long)], win: Int, stride: Int) = {
      val cells = n.toLong * n
      (0L to cells - win by stride.toLong).map { d0 =>
        val pts = (d0 until d0 + win).map(inv)
        (pts.map(_._1).max - pts.map(_._1).min) +
          (pts.map(_._2).max - pts.map(_._2).min)
      }.sum
    }
    val grid = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val invH = grid.map(p => refHilbert(bits, p._1, p._2) -> p).toMap
    val invZ = grid.map(p => refMorton(p._1, p._2) -> p).toMap
    val (h, z) = (spanSum(invH, 64, 32), spanSum(invZ, 64, 32))
    assert(h == 478L && z == 586L, s"reference drift: h=$h z=$z")
    assert(h < z, "hilbert must dominate morton on unaligned windows")
  }

  test("q193 aligned hilbert buckets are exact quadrants (span <= 63)") {
    val out = ZOrder.hilbertQuery(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 63,
        "x span must stay within the bucket quadrant")
      assert(r.getLong(5) - r.getLong(4) <= 63,
        "y span must stay within the bucket quadrant")
    }
  }
}
