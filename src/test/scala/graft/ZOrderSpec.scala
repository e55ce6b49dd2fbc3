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
}
