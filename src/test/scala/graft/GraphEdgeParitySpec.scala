package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphRank

/** The grouped-array edge builders must emit EXACTLY the pair sets of
  * the self-join reference formulation they replaced (round-18
  * optimization: one cell-keyed aggregation + array comprehension
  * instead of countDistinct pre-pass + join-back + member×member
  * self-join). Row-for-row parity on the real fixture pins the two
  * spellings together — unweighted, weighted (multiplicities), and
  * temporal (carried hour stamp). */
class GraphEdgeParitySpec extends SparkSpec {

  private lazy val cells =
    GraphRank.activityCells(graft.sources.Tables.events(spark, sf0001))
      .localCheckpoint()

  test("edgesFromCells matches the self-join reference") {
    val fast = GraphRank.edgesFromCells(cells)
    val ref = GraphRank.cellPairsReference(cells)
      .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .distinct()
    assert(fast.count() > 0)
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
  }

  test("weightedCoActivityEdges matches reference multiplicities") {
    val fast = GraphRank.weightedCoActivityEdges(cells)
    val ref = GraphRank.cellPairsReference(cells)
      .groupBy(col("a.user_id").as("u"), col("b.user_id").as("v"))
      .agg(count(lit(1)).cast("long").as("w"))
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
  }

  test("temporal array spelling matches the join spelling in use") {
    // temporalEdges deliberately keeps the join spelling (see its
    // scaladoc); pin the grouped-array alternative to it so the two
    // formulations stay interchangeable by measurement alone
    val viaArrays = GraphRank.cellMemberSets(cells)
      .withColumn("t",
        datediff(col("d"), lit("1970-01-01")).cast("long") * 24
          + col("h"))
      .select(explode(GraphRank.memberPairs(col("us"))).as("p"),
        col("t"))
      .select(col("p.u").as("u"), col("p.v").as("v"), col("t"))
      .distinct()
    val inUse = graft.operators.GraphTopology.temporalEdges(cells)
    assert(viaArrays.exceptAll(inUse).count() == 0)
    assert(inUse.exceptAll(viaArrays).count() == 0)
  }
}
